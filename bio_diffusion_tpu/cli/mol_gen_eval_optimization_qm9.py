"""Guided property-optimization evaluation (counterpart of reference
src/mol_gen_eval_optimization_qm9.py).

Two-phase protocol:
  1. (optional) generate initial molecules with an UNCONDITIONAL model using
     few (e.g. 10) denoising steps — intentionally low-quality starting
     points (fixed 19-node molecules, reference :288);
  2. repeatedly re-noise + denoise them through the CONDITIONAL model's last
     ``num_optimization_timesteps`` reverse steps with a fixed property
     context ("optimization"), tracking molecule stability and the
     classifier MAE per iteration.

Usage:
  python -m bio_diffusion_tpu.cli.mol_gen_eval_optimization_qm9 \
      unconditional_generator_model_filepath=... \
      conditional_generator_model_filepath=... classifier_model_dir=... \
      property=alpha iterations=10
"""

from __future__ import annotations

import copy
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.cli.common import inference_mesh, load_model, nodes_distribution_for, parse_cli
from bio_diffusion_tpu.cli.mol_gen_eval_conditional_qm9 import apply_conditional_surgery
from bio_diffusion_tpu.chem.stability import batch_molecular_stability
from bio_diffusion_tpu.config.build import build_datasets, build_experiment, get_dataset_info_for
from bio_diffusion_tpu.models.distributions import PropertiesDistribution, compute_mean_mad
from bio_diffusion_tpu.train.sampling import SegmentedSampler, make_node_mask
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)

FIXED_NUM_NODES = 19  # reference :288


def main(argv=None):
    cfg, flags = parse_cli(
        list(sys.argv[1:] if argv is None else argv), "mol_gen_eval_optimization_qm9"
    )
    prop = str(cfg.get("property", "alpha"))
    batch_size = int(cfg.get("batch_size", 100))
    num_samples = int(cfg.get("num_samples", 1000))
    iterations = int(cfg.get("iterations", 10))
    num_gen_timesteps = int(cfg.get("num_gen_timesteps", 10))
    num_opt_timesteps = int(cfg.get("num_optimization_timesteps", 100))

    rng = np.random.default_rng(build_experiment(cfg).seed)
    key = jax.random.PRNGKey(build_experiment(cfg).seed)

    # ---- phase 1: initial molecules from the unconditional model ----
    uncond_cfg = copy.deepcopy(cfg)
    uncond_exp = build_experiment(uncond_cfg)
    dataset_info = get_dataset_info_for(uncond_exp)
    k_types = len(dataset_info["atom_decoder"])

    sizes = np.full(num_samples, FIXED_NUM_NODES)
    node_mask_np = make_node_mask(sizes, FIXED_NUM_NODES)

    pregen_dir = cfg.get("pregenerated_molecules_dir")
    if cfg.get("use_pregenerated_molecules") and pregen_dir:
        from bio_diffusion_tpu.chem.molecule import load_molecule_xyz

        files = sorted(
            os.path.join(str(pregen_dir), f) for f in os.listdir(str(pregen_dir)) if f.endswith(".xyz")
        )[:num_samples]
        xs, ohs = [], []
        for fpath in files:
            p, oh = load_molecule_xyz(fpath, dataset_info)
            xs.append(p), ohs.append(oh)
        num_samples = len(xs)
        sizes = np.array([len(p) for p in xs])
        pad = int(sizes.max())
        node_mask_np = make_node_mask(sizes, pad)
        x0 = np.zeros((num_samples, pad, 3), np.float32)
        oh0 = np.zeros((num_samples, pad, k_types), np.float32)
        for i, (p, oh) in enumerate(zip(xs, ohs)):
            x0[i, : len(p)] = p
            oh0[i, : len(p)] = oh
    else:
        uncond_ckpt = cfg.get("unconditional_generator_model_filepath")
        evd_u, params_u = load_model(uncond_exp, uncond_ckpt)
        sampler_u = SegmentedSampler(evd_u, params_u, mesh=inference_mesh(cfg))
        xs, ohs = [], []
        for start in range(0, num_samples, batch_size):
            b = min(batch_size, num_samples - start)
            key, k = jax.random.split(key)
            xh = sampler_u.run(k, jnp.asarray(node_mask_np[:b]), num_timesteps=num_gen_timesteps)
            xs.append(xh[..., :3])
            ohs.append(xh[..., 3:3 + k_types])
        x0 = np.concatenate(xs)
        oh0 = np.concatenate(ohs)
        if cfg.get("save_molecules", True):
            from bio_diffusion_tpu.chem.molecule import save_xyz_files

            out_dir = os.path.join(str(cfg.get("output_dir", "outputs/opt")), "initial_molecules")
            save_xyz_files(out_dir, x0, oh0, node_mask_np[: len(x0)], dataset_info)

    if cfg.get("generate_molecules_only"):
        print(json.dumps({"generated": int(len(x0))}))
        return {"generated": int(len(x0))}

    # ---- phase 2: conditional optimization round-trips ----
    cond_cfg = apply_conditional_surgery(copy.deepcopy(cfg), prop)
    cond_exp = build_experiment(cond_cfg)
    evd_c, params_c = load_model(
        cond_exp, cfg.get("conditional_generator_model_filepath") or cfg.get("ckpt_path")
    )

    datasets = build_datasets(cond_exp)
    norm_split = "valid" if cond_exp.dataloader_cfg.dataset == "QM9_second_half" else "train"
    props_norms = {prop: compute_mean_mad(datasets[norm_split].property_values(prop))}
    train_ds = datasets["train"]
    props_distr = PropertiesDistribution(
        train_ds.data["num_atoms"], {prop: train_ds.property_values(prop)},
        normalizer=props_norms,
    )
    mean, mad = props_norms[prop]["mean"], props_norms[prop]["mad"]

    # classifier: a JAX classifier dir trained by cli.train_classifier
    # (classifier.npz/classifier.json) or the reference torch directory
    # layout (args.pickle + best_checkpoint.npy) — same branching as the
    # conditional eval CLI, so the guided-optimization protocol (reference
    # mol_gen_eval_optimization_qm9.py:433-449) is self-contained end to end
    classifier_dir = cfg.get("classifier_model_dir")
    cls_meta: dict = {}
    if classifier_dir and os.path.isdir(str(classifier_dir)):
        from bio_diffusion_tpu.train.classifier_train import (
            is_jax_classifier_dir, load_jax_classifier,
        )

        if is_jax_classifier_dir(str(classifier_dir)):
            classifier, cls_params, cls_meta = load_jax_classifier(str(classifier_dir))
            if cls_meta.get("property") not in (None, prop):
                log.warning(
                    f"classifier was trained for property "
                    f"{cls_meta['property']!r}, optimizing {prop!r}"
                )
        else:
            from bio_diffusion_tpu.models.classifier import load_torch_classifier

            classifier, cls_params = load_torch_classifier(str(classifier_dir))
    else:
        from bio_diffusion_tpu.models.classifier import EGNNClassifier

        log.warning("No classifier_model_dir — randomly initialized classifier (smoke only)")
        classifier = EGNNClassifier(in_node_nf=5, hidden_nf=32, n_layers=2)
        cls_params = classifier.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 5)), jnp.zeros((1, 4, 3)), jnp.ones((1, 4))
        )
    # decode classifier predictions with ITS training-time normalizer when
    # saved (JAX dirs carry mean/mad in classifier.json); the conditioning
    # target keeps the generator dataset's normalizer
    cls_mean = float(cls_meta.get("mean", mean))
    cls_mad = float(cls_meta.get("mad", mad))
    classify = jax.jit(lambda p, h, x, m: classifier.apply(p, h, x, m))

    # the re-noise/denoise round trips ride the baked fast path (Pallas
    # kernels on TPU, mesh-aware) when the conditional config supports it
    from bio_diffusion_tpu.train.sampling import build_fast_evd

    fast_c = build_fast_evd(evd_c, params_c, mesh=inference_mesh(cfg))
    opt_evd, opt_params = (fast_c, {}) if fast_c is not None else (evd_c, params_c)
    optimize = jax.jit(
        lambda p, k, x, h, m, ctx: opt_evd.apply(
            p, k, x, h, m, num_opt_timesteps, ctx, method=opt_evd.mol_gen_optimize
        )
    )

    # fixed per-molecule contexts for the whole optimization
    pad = x0.shape[1]
    node_mask = jnp.asarray(node_mask_np[: len(x0)])
    ctx_norm = props_distr.sample_batch(np.asarray(node_mask).sum(-1).astype(int), rng)
    context = jnp.asarray(
        np.broadcast_to(ctx_norm[:, None, :], (len(x0), pad, 1)).copy()
        * np.asarray(node_mask)[..., None]
    )
    target = ctx_norm[:, 0] * mad + mean

    x_cur, oh_cur = jnp.asarray(x0), jnp.asarray(oh0)
    history = []
    for it in range(iterations):
        key, k = jax.random.split(key)
        # center current molecules (optimize expects CoM-free input)
        from bio_diffusion_tpu.ops.geometry import centralize

        _, x_cur = centralize(x_cur, node_mask)
        results = []
        for start in range(0, len(x0), batch_size):
            sl = slice(start, min(start + batch_size, len(x0)))
            out = optimize(opt_params, jax.random.fold_in(k, start),
                           x_cur[sl], oh_cur[sl], node_mask[sl], context[sl])
            results.append(np.asarray(out))
        out = np.concatenate(results)
        x_cur = jnp.asarray(out[..., :3])
        oh_cur = jnp.asarray(out[..., 3:3 + k_types])

        mol_stable, stable_atoms, num_atoms = batch_molecular_stability(
            out[..., :3], out[..., 3:3 + k_types].argmax(-1), np.asarray(node_mask), dataset_info
        )
        pred = np.asarray(classify(cls_params, oh_cur, x_cur, node_mask))
        mae = float(np.abs(cls_mad * pred + cls_mean - target).mean())
        entry = {
            "iteration": it + 1,
            "mol_stable": float(mol_stable.mean()),
            "atm_stable": float(stable_atoms.sum() / max(num_atoms.sum(), 1)),
            "mae": mae,
        }
        history.append(entry)
        log.info(f"optimization {entry}")

    result = {"property": prop, "history": history, "final": history[-1] if history else None}
    out_dir = str(cfg.get("output_dir", "outputs/mol_gen_eval_optimization_qm9"))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"optimization_eval_{prop}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["final"]))
    return result


if __name__ == "__main__":
    main()
