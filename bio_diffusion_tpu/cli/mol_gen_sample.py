"""Molecule sampling entry point (counterpart of reference src/mol_gen_sample.py).

Usage:
  python -m bio_diffusion_tpu.cli.mol_gen_sample ckpt_path=... num_samples=250 \
      [num_nodes=19] [num_timesteps=1000] [ddpm_mode=inpainting|chain] [k=v ...]

``ddpm_mode=chain`` writes one molecule's denoising chain as per-frame xyz
files + output.gif (reference sample_chain_and_save).

Writes per-molecule .xyz files (+ one .sdf when RDKit is available) and
prints stability metrics of the generated batch.
"""

from __future__ import annotations

import datetime
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.cli.common import inference_mesh, load_model, nodes_distribution_for, parse_cli
from bio_diffusion_tpu.config.build import build_experiment, get_dataset_info_for
from bio_diffusion_tpu.train.sampling import (
    SegmentedSampler,
    analyze_samples,
    make_node_mask,
    sample_molecules,
)
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    cfg, flags = parse_cli(list(sys.argv[1:] if argv is None else argv), "mol_gen_sample")
    # reference arg names accepted as aliases (ref mol_gen_sample.py:173-177);
    # they are absent from the YAML defaults, so their presence means the user
    # passed them: all_frags=X <=> largest_frag=(not X); relax=true <=> relax_iter=200
    if "all_frags" in cfg:
        cfg["largest_frag"] = not bool(cfg["all_frags"])
    if cfg.get("relax") and not cfg.get("relax_iter"):
        cfg["relax_iter"] = 200
    exp = build_experiment(cfg)
    dataset_info = get_dataset_info_for(exp)
    nodes_dist = nodes_distribution_for(exp)

    evd, params = load_model(exp, cfg.get("ckpt_path"))
    sampler = SegmentedSampler(evd, params, mesh=inference_mesh(cfg))
    rng = np.random.default_rng(exp.seed)
    key = jax.random.PRNGKey(exp.seed)

    num_samples = int(cfg.get("num_samples", 250))
    num_timesteps = cfg.get("num_timesteps")
    num_timesteps = int(num_timesteps) if num_timesteps else None
    ddpm_mode = cfg.get("ddpm_mode", "unconditional")

    if ddpm_mode == "inpainting":
        # fix the first node of each molecule at the origin (reference
        # generate_molecules' default fixed point, qm9_mol_gen_ddpm.py:1158-1164)
        num_nodes = cfg.get("num_nodes")
        sizes = (
            np.full(num_samples, int(num_nodes))
            if num_nodes
            else nodes_dist.sample(num_samples, rng)
        )
        pad = int(sizes.max())
        node_mask = jnp.asarray(make_node_mask(sizes, pad))
        fixed = np.zeros((num_samples, pad), np.float32)
        fixed[:, 0] = 1.0
        k = len(dataset_info["atom_decoder"])
        x0 = jnp.zeros((num_samples, pad, 3))
        h0c = jnp.zeros((num_samples, pad, k))
        h0i = jnp.zeros((num_samples, pad, 1))
        # inpainting rides the baked fast path (Pallas kernels) when the
        # config supports it, under one jit; module-path fallback otherwise
        from bio_diffusion_tpu.train.sampling import build_fast_evd

        fast = build_fast_evd(evd, params, mesh=inference_mesh(cfg))
        inp_evd, inp_params = (fast, {}) if fast is not None else (evd, params)
        n_res = int(cfg.get("num_resamplings", 1))
        jump = int(cfg.get("jump_length", 1))

        @jax.jit
        def run_inpaint(p, k):
            return inp_evd.apply(
                p, k, x0, h0c, h0i, node_mask, jnp.asarray(fixed),
                n_res, jump, num_timesteps, method=inp_evd.inpaint,
            )

        xh = run_inpaint(inp_params, key)
        xh, node_mask = np.asarray(xh), np.asarray(node_mask)
    elif ddpm_mode == "chain":
        # denoising-chain visualization (reference sample_chain_and_save,
        # qm9_mol_gen_ddpm.py:956-1060): one molecule, all T intermediate
        # states collected from the reverse scan, subsampled to keep_frames
        # xyz files + a GIF.
        num_nodes = cfg.get("num_nodes")
        sizes = (
            np.full(1, int(num_nodes)) if num_nodes else nodes_dist.sample(1, rng)
        )
        node_mask = jnp.asarray(make_node_mask(sizes, int(sizes.max())))
        T_s = num_timesteps or evd.T
        # single molecule: baked fast path when supported (no mesh — B=1)
        from bio_diffusion_tpu.train.sampling import build_fast_evd

        fast = build_fast_evd(evd, params)
        ch_evd, ch_params = (fast, {}) if fast is not None else (evd, params)
        chain_fn = jax.jit(
            lambda p, k, m: ch_evd.apply(
                p, k, m, num_timesteps=T_s, return_frames=T_s,
                method=ch_evd.mol_gen_sample,
            )
        )
        xh, frames = chain_fn(ch_params, key, node_mask)
        xh, frames, node_mask = np.asarray(xh), np.asarray(frames), np.asarray(node_mask)

        from bio_diffusion_tpu.chem.visualization import save_chain_frames, visualize_chain

        chain_dir = os.path.join(
            str(cfg.get("output_dir", "outputs/mol_gen_sample")),
            datetime.datetime.now().strftime("%Y%m%d_%H%M%S"), "chain",
        )
        save_chain_frames(
            frames[:, 0], node_mask[0], dataset_info, chain_dir,
            keep_frames=int(cfg.get("keep_frames", 100)),
        )
        visualize_chain(chain_dir, dataset_info)
    else:
        num_nodes = cfg.get("num_nodes")
        if num_nodes:
            sizes = np.full(num_samples, int(num_nodes))
            node_mask = jnp.asarray(make_node_mask(sizes, int(num_nodes)))
            xh = sampler.run(key, node_mask, num_timesteps=num_timesteps)
            node_mask = np.asarray(node_mask)
        else:
            xh, node_mask, _ = sample_molecules(
                sampler, key, num_samples, nodes_dist, rng,
                batch_size=min(num_samples, int(cfg.get("sampling_batch_size", 100))),
                num_timesteps=num_timesteps,
            )

    out_dir = os.path.join(
        str(cfg.get("output_dir", "outputs/mol_gen_sample")),
        datetime.datetime.now().strftime("%Y%m%d_%H%M%S"),
    )
    from bio_diffusion_tpu.chem.molecule import RDKIT_AVAILABLE, save_xyz_files

    k = len(dataset_info["atom_decoder"])
    files = save_xyz_files(out_dir, xh[..., :3], xh[..., 3:3 + k], node_mask, dataset_info)
    log.info(f"Wrote {len(files)} xyz files to {out_dir}")

    if RDKIT_AVAILABLE:
        from bio_diffusion_tpu.chem.molecule import build_molecule, process_molecule, write_sdf_file

        mols = []
        for i in range(len(xh)):
            m = node_mask[i] > 0
            mol = build_molecule(xh[i, :, :3][m], xh[i, :, 3:3 + k][m].argmax(-1), dataset_info)
            mol = process_molecule(
                mol,
                add_hydrogens=bool(cfg.get("add_hydrogens", False)),
                sanitize=bool(cfg.get("sanitize", False)),
                relax_iter=int(cfg.get("relax_iter", 0)),
                largest_frag=bool(cfg.get("largest_frag", False)),
            )
            if mol is not None:
                mols.append(mol)
        sdf_path = os.path.join(out_dir, "molecules.sdf")
        write_sdf_file(sdf_path, mols)
        log.info(f"Wrote {len(mols)} molecules to {sdf_path}")

    metrics = analyze_samples(xh, node_mask, dataset_info, exp.dataloader_cfg.include_charges)
    log.info(f"Sample metrics: {metrics}")
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
