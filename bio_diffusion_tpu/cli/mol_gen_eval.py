"""Evaluation entry point (counterpart of reference src/mol_gen_eval.py).

Samples ``num_samples`` molecules, reports stability/validity/uniqueness/
novelty + atom-type KL, and (optionally) the test NLL averaged over
``num_test_passes`` passes.

Usage:
  python -m bio_diffusion_tpu.cli.mol_gen_eval ckpt_path=... num_samples=10000
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from bio_diffusion_tpu.cli.common import inference_mesh, load_model, nodes_distribution_for, parse_cli
from bio_diffusion_tpu.config.build import build_datasets, build_experiment, get_dataset_info_for
from bio_diffusion_tpu.train.sampling import SegmentedSampler, analyze_samples, sample_molecules
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    cfg, flags = parse_cli(list(sys.argv[1:] if argv is None else argv), "mol_gen_eval")
    exp = build_experiment(cfg)
    dataset_info = get_dataset_info_for(exp)
    nodes_dist = nodes_distribution_for(exp)

    evd, params = load_model(exp, cfg.get("ckpt_path"))
    mesh = inference_mesh(cfg)
    sampler = SegmentedSampler(evd, params, mesh=mesh)
    rng = np.random.default_rng(exp.seed)
    key = jax.random.PRNGKey(exp.seed)

    num_samples = int(cfg.get("num_samples", 10000))
    batch_size = int(cfg.get("sampling_batch_size", 100))
    num_timesteps = cfg.get("num_timesteps")
    num_timesteps = int(num_timesteps) if num_timesteps else None

    xh, node_mask, _ = sample_molecules(
        sampler, key, num_samples, nodes_dist, rng,
        batch_size=batch_size, num_timesteps=num_timesteps,
    )

    # optional RDKit metrics with training-set SMILES for novelty
    from bio_diffusion_tpu.chem.rdkit_bridge import build_molecular_metrics

    molecular_metrics = build_molecular_metrics(
        dataset_info, exp.dataloader_cfg.smiles_filepath
    )

    metrics = analyze_samples(
        xh, node_mask, dataset_info,
        include_charges=exp.dataloader_cfg.include_charges,
        molecular_metrics=molecular_metrics,
    )

    # test NLL over multiple passes (reference mol_gen_eval.py:172-186)
    if cfg.get("evaluate_nll", True):
        try:
            datasets = build_datasets(exp)
            from bio_diffusion_tpu.data.batch import iterate_dense_batches
            from bio_diffusion_tpu.train.step import make_eval_step

            nll_evd, nll_params = evd, params
            if cfg.get("fast_nll", False):
                # opt-in: run the NLL forward through the baked-weight fast
                # path (bf16 body + Pallas kernels); reported NLL may differ
                # from the f32 module path at ~1e-3 level
                from bio_diffusion_tpu.train.sampling import build_fast_evd

                fast = build_fast_evd(evd, params, mesh=mesh)
                if fast is not None:
                    nll_evd, nll_params = fast, {}
                    log.info("NLL evaluation using the fast inference path")
            eval_step = make_eval_step(
                nll_evd, exp.diffusion_cfg, exp.dataloader_cfg, nodes_dist.log_prob_table
            )
            from bio_diffusion_tpu.parallel.mesh import shard_batch

            if mesh is not None and nll_params:
                # params replicated onto the mesh devices (jit refuses
                # mixed single-device/mesh argument placements)
                from jax.sharding import NamedSharding, PartitionSpec

                nll_params = jax.device_put(
                    nll_params, NamedSharding(mesh, PartitionSpec())
                )

            def shard(batch):
                # NLL passes scale out with the inference mesh too
                return shard_batch(mesh, batch)

            passes = []
            for p in range(int(cfg.get("num_test_passes", 5))):
                losses = []
                for i, batch in enumerate(iterate_dense_batches(
                    datasets["test"], exp.dataloader_cfg.batch_size,
                    rng=rng, shuffle=False, drop_last=False,
                    pad_to=datasets["test"].data["positions"].shape[1],
                )):
                    info = eval_step(nll_params, shard(batch),
                                     jax.random.fold_in(key, p * 10000 + i))
                    losses.append(float(np.asarray(info["loss"])))
                passes.append(float(np.mean(losses)))
            metrics["test_nll"] = float(np.mean(passes))
            metrics["test_nll_passes"] = passes
        except (RuntimeError, FileNotFoundError) as e:
            log.warning(f"Skipping NLL evaluation (dataset unavailable): {e}")

    out_dir = str(cfg.get("output_dir", "outputs/mol_gen_eval"))
    os.makedirs(out_dir, exist_ok=True)
    if cfg.get("save_molecules", False):
        # the reference's save_molecules=True keeps the sampled set for the
        # offline analysis stage (obabel/PoseBusters; ref mol_gen_eval.py
        # output + analysis/molecule_analysis.py)
        from bio_diffusion_tpu.chem.molecule import save_xyz_files

        k = len(dataset_info["atom_decoder"])
        files = save_xyz_files(
            os.path.join(out_dir, "molecules"), xh[..., :3], xh[..., 3:3 + k],
            node_mask, dataset_info,
        )
        log.info(f"Saved {len(files)} sampled molecules")
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    log.info(f"Evaluation metrics: {metrics}")
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
