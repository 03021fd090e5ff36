"""Molecule sampling entry point (counterpart of reference src/mol_gen_sample.py).

Usage:
  python -m bio_diffusion_tpu.cli.mol_gen_sample ckpt_path=... num_samples=250 \
      [num_nodes=19] [num_timesteps=1000] [ddpm_mode=inpainting|chain|pocket] [k=v ...]

``ddpm_mode=chain`` writes one molecule's denoising chain as per-frame xyz
files + output.gif (reference sample_chain_and_save).

``ddpm_mode=pocket`` generates ligands into protein pockets by RePaint
inpainting over the joint ligand+pocket graph (use with
``experiment=pocket_mol_gen_ddpm``).  Pocket input: ``pocket_file=<.pdb>``
extracts CA atoms from a real structure (``pocket_chain=``,
``pocket_center=[x,y,z]`` + ``pocket_radius=`` or ``pocket_ligand=<HETATM
resname>`` cut out the binding site), ``pocket_file=<.json>`` supplies
coords+residues directly, otherwise synthetic shell pockets demo the path
offline.

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
    extra_metrics: dict = {}
    out_dir = os.path.join(
        str(cfg.get("output_dir", "outputs/mol_gen_sample")),
        datetime.datetime.now().strftime("%Y%m%d_%H%M%S"),
    )

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
    elif ddpm_mode == "pocket":
        # pocket-conditional ligand generation (the GCDM-SBDD workload,
        # reference README.md:302-304 / constants.py:98-1742): RePaint over
        # the joint ligand+pocket graph with pocket rows fixed.  Pocket
        # input: pocket_file=<.pdb> (CA extraction, optional binding-site
        # cutout) or <.json with "coords" [[x,y,z],..] and "residues"
        # ["A","C",..]>, replicated num_samples times; otherwise synthetic
        # shell pockets (offline demo).  pocket_size / num_nodes(ligand)
        # override the joint-histogram sampling.
        import json as _json

        from bio_diffusion_tpu.data.pocket import (
            get_pocket_dataset_info,
            ligand_dataset_info,
            sample_joint_sizes,
            synthetic_pockets,
        )
        from bio_diffusion_tpu.train.sampling import generate_ligands_in_pocket

        pocket_name = str(cfg.get("pocket_dataset")
                          or (exp.dataloader_cfg.dataset
                              if exp.dataloader_cfg.dataset
                              in ("bindingmoad", "crossdock", "crossdock_full")
                              else "bindingmoad"))
        pinfo = get_pocket_dataset_info(pocket_name)
        kl = len(pinfo["atom_decoder"])

        pocket_file = cfg.get("pocket_file")
        if pocket_file:
            if str(pocket_file).lower().endswith(".pdb"):
                # real structure: CA extraction (optionally one chain, or a
                # radius cutout around pocket_center / the pocket_ligand
                # HETATM centroid — the GCDM-SBDD binding-site definition)
                from bio_diffusion_tpu.data.pocket import load_pocket_pdb

                center = cfg.get("pocket_center")
                px1, pa1 = load_pocket_pdb(
                    str(pocket_file), pocket_name,
                    chain=cfg.get("pocket_chain"),
                    center=np.asarray(center, np.float32) if center else None,
                    radius=(float(cfg["pocket_radius"])
                            if cfg.get("pocket_radius") else None),
                    ligand_resname=cfg.get("pocket_ligand"),
                )
            else:
                with open(str(pocket_file)) as f:
                    spec = _json.load(f)
                px1 = np.asarray(spec["coords"], dtype=np.float32)
                aa_enc = pinfo["aa_encoder"]
                pa1 = np.asarray(
                    [r if isinstance(r, int) else aa_enc[str(r)]
                     for r in spec["residues"]],
                    dtype=np.int64,
                )
            pocket_x = np.broadcast_to(px1, (num_samples,) + px1.shape).copy()
            pocket_aa = np.broadcast_to(pa1, (num_samples,) + pa1.shape).copy()
            pocket_mask = np.ones((num_samples, len(px1)), np.float32)
            pocket_sizes = np.full(num_samples, len(px1))
        else:
            log.warning(
                "No pocket_file given — generating synthetic shell pockets "
                "(offline demo; provide pocket_file for real structures)"
            )
            psize = cfg.get("pocket_size")
            if psize:
                pocket_sizes = np.full(num_samples, int(psize))
            else:
                _, pocket_sizes = sample_joint_sizes(pocket_name, num_samples, rng)
            pocket_x, pocket_aa, pocket_mask = synthetic_pockets(
                pocket_name, pocket_sizes, rng
            )

        num_nodes = cfg.get("num_nodes")
        if num_nodes:
            ligand_sizes = np.full(num_samples, int(num_nodes))
        else:
            # ligand size conditioned on each pocket's size via the joint
            # histogram (clamped into the histogram's column range)
            max_col = np.asarray(pinfo["n_nodes"]).shape[1] - 1
            ligand_sizes = np.array([
                sample_joint_sizes(pocket_name, 1, rng,
                                   pocket_size=int(min(s, max_col)))[0][0]
                for s in pocket_sizes
            ])

        out = generate_ligands_in_pocket(
            evd, params, key,
            pocket_x=pocket_x, pocket_types=pocket_aa, pocket_mask=pocket_mask,
            ligand_sizes=ligand_sizes, num_ligand_atom_types=kl,
            num_resamplings=int(cfg.get("num_resamplings", 1)),
            jump_length=int(cfg.get("jump_length", 1)),
            num_timesteps=num_timesteps,
            mesh=inference_mesh(cfg),
        )
        xh = np.concatenate([out["ligand_x"], out["ligand_one_hot"]], axis=-1)
        node_mask = out["ligand_mask"]
        # metrics + I/O run on the LIGAND space (the pocket is conditioning)
        dataset_info = ligand_dataset_info(pocket_name)
        # geometric pocket diagnostics (bonded-scale spacing + containment
        # in the pocket — discriminating even where valence stability is
        # null, train/sampling.py ligand_pocket_geometry)
        from bio_diffusion_tpu.train.sampling import ligand_pocket_geometry

        extra_metrics = ligand_pocket_geometry(
            out["ligand_x"], out["ligand_mask"], pocket_x, pocket_mask
        )
        # keep the conditioning pockets alongside the generated ligands
        pocket_out = {
            "coords": pocket_x.tolist(),
            "residue_index": pocket_aa.tolist(),
            "mask": pocket_mask.tolist(),
            "dataset": pocket_name,
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "pockets.json"), "w") as f:
            _json.dump(pocket_out, f)
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

        chain_dir = os.path.join(out_dir, "chain")
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
    metrics.update(extra_metrics)
    log.info(f"Sample metrics: {metrics}")
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
