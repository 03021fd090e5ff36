"""Conditional-generation evaluation (counterpart of reference
src/mol_gen_eval_conditional_qm9.py).

Protocol: load a property-conditional generator, sample molecules with
property contexts drawn from the per-size property histograms, score them
with the pretrained EGNN property classifier, and report the MAE between
the classifier's prediction and the conditioning value (reference
ConditionalDiffusionDataLoader + test_with_property_classifier).

Config surgery performed at runtime exactly like the reference (:201-206):
dataset=QM9_second_half, conditioning=[property], norm_values=[1,8,1],
include_charges=false.

Usage:
  python -m bio_diffusion_tpu.cli.mol_gen_eval_conditional_qm9 \
      generator_model_filepath=... classifier_model_dir=... property=alpha
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.cli.common import inference_mesh, load_model, nodes_distribution_for, parse_cli
from bio_diffusion_tpu.config.build import build_datasets, build_experiment
from bio_diffusion_tpu.models.distributions import PropertiesDistribution, compute_mean_mad
from bio_diffusion_tpu.train.sampling import SegmentedSampler, make_node_mask
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def apply_conditional_surgery(cfg, prop: str):
    """The reference's runtime open_dict config edits (:201-206)."""
    model = cfg.setdefault("model", {})
    model.setdefault("module_cfg", {})["conditioning"] = [prop]
    model.setdefault("diffusion_cfg", {})["norm_values"] = [1.0, 8.0, 1.0]
    dm = cfg.setdefault("datamodule", {}).setdefault("dataloader_cfg", {})
    if dm.get("dataset") != "synthetic":
        dm["dataset"] = "QM9_second_half"
    dm["include_charges"] = False
    return cfg


def main(argv=None):
    cfg, flags = parse_cli(
        list(sys.argv[1:] if argv is None else argv), "mol_gen_eval_conditional_qm9"
    )
    prop = str(cfg.get("property", "alpha"))
    cfg = apply_conditional_surgery(cfg, prop)
    exp = build_experiment(cfg)
    nodes_dist = nodes_distribution_for(exp)

    evd, params = load_model(exp, cfg.get("generator_model_filepath") or cfg.get("ckpt_path"))
    sampler = SegmentedSampler(evd, params, mesh=inference_mesh(cfg))

    # property normalizers from the second-half valid split (reference
    # compute_mean_mad for QM9_second_half)
    datasets = build_datasets(exp)
    norm_split = "valid" if exp.dataloader_cfg.dataset == "QM9_second_half" else "train"
    props_norms = {prop: compute_mean_mad(datasets[norm_split].property_values(prop))}
    train_ds = datasets["train"]
    props_distr = PropertiesDistribution(
        train_ds.data["num_atoms"], {prop: train_ds.property_values(prop)},
        normalizer=props_norms,
    )
    mean, mad = props_norms[prop]["mean"], props_norms[prop]["mad"]

    # classifier: a JAX classifier dir trained by cli.train_classifier
    # (classifier.npz/classifier.json) or the reference torch directory
    # layout (args.pickle + best_checkpoint.npy)
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
                    f"{cls_meta['property']!r}, evaluating {prop!r}"
                )
        else:
            from bio_diffusion_tpu.models.classifier import load_torch_classifier

            classifier, cls_params = load_torch_classifier(str(classifier_dir))
    else:
        from bio_diffusion_tpu.models.classifier import EGNNClassifier

        log.warning("No classifier_model_dir — using a randomly initialized classifier "
                    "(MAE numbers will be meaningless; for smoke testing only)")
        classifier = EGNNClassifier(in_node_nf=5, hidden_nf=32, n_layers=2)
        cls_params = classifier.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 5)), jnp.zeros((1, 4, 3)), jnp.ones((1, 4))
        )
    classify = jax.jit(lambda p, h, x, m: classifier.apply(p, h, x, m))

    rng = np.random.default_rng(exp.seed)
    key = jax.random.PRNGKey(exp.seed)
    batch_size = int(cfg.get("batch_size", 100))
    iterations = int(cfg.get("iterations", 100))

    # the reference selects sweep mode with sweep_property_values=true
    # (ref mol_gen_eval_conditional_qm9.py:271-283); accepted as an alias
    if str(cfg.get("task", "edm")) == "qualitative" or bool(cfg.get("sweep_property_values", False)):
        # property sweep with FIXED noise: a linspace of property values over
        # 19-node molecules, visualized as a chain GIF (reference
        # sample_sweep_conditionally, models/__init__.py:201-261)
        from bio_diffusion_tpu.chem.molecule import save_xyz_files
        from bio_diffusion_tpu.chem.visualization import visualize_chain
        from bio_diffusion_tpu.config.build import get_dataset_info_for

        dataset_info = get_dataset_info_for(exp)
        num_frames = int(cfg.get("sweep_n_frames", 100))
        num_sweeps = int(cfg.get("num_sweeps", 10))
        out_root = str(cfg.get("output_dir", "outputs/conditional_sweeps"))
        n_nodes = 19
        dist = props_distr.distributions[prop][n_nodes]
        lo, hi = dist["params"]
        ctx_vals = (np.linspace(lo, hi, num_frames) - mean) / mad
        for sweep in range(num_sweeps):
            node_mask = jnp.asarray(make_node_mask(np.full(num_frames, n_nodes), n_nodes))
            context = jnp.asarray(
                np.broadcast_to(ctx_vals[:, None, None], (num_frames, n_nodes, 1)).copy()
                .astype(np.float32)
            )
            key, k = jax.random.split(key)
            xh = sampler.run(k, node_mask, context=context, fix_noise=True)
            out_dir = os.path.join(out_root, prop, f"sweep_{sweep}")
            save_xyz_files(out_dir, xh[..., :3], xh[..., 3:8], np.asarray(node_mask),
                           dataset_info, name="conditional")
            visualize_chain(out_dir, dataset_info)
            log.info(f"sweep {sweep + 1}/{num_sweeps} written to {out_dir}")
        print(json.dumps({"property": prop, "sweeps": num_sweeps}))
        return {"property": prop, "sweeps": num_sweeps}
    num_timesteps = cfg.get("num_timesteps")
    num_timesteps = int(num_timesteps) if num_timesteps else None

    # bucketed padding across the whole protocol (the same ladder as the
    # unconditional eval protocol, train/sampling.py sample_molecules):
    # sizes for ALL iterations are drawn up front and sorted, so each batch
    # pads only to its own multiple-of-2 bucket instead of max_n — context
    # is per-graph, so conditioning composes with bucketing unchanged.
    # single_bucket=true restores the reference padding for comparison.
    from bio_diffusion_tpu.data.batch import select_bucket

    single_bucket = bool(cfg.get("single_bucket", False))
    sizes_all = nodes_dist.sample(iterations * batch_size, rng)
    if not single_bucket:
        sizes_all = np.sort(sizes_all)[::-1]

    maes = []
    for it in range(iterations):
        num_nodes = sizes_all[it * batch_size: (it + 1) * batch_size]
        if single_bucket:
            pad = int(nodes_dist.max_n)
        else:
            pad = min(select_bucket(int(num_nodes.max()), None, 2), int(nodes_dist.max_n))
        node_mask = jnp.asarray(make_node_mask(num_nodes, pad))
        ctx_norm = props_distr.sample_batch(num_nodes, rng)  # normalized [B,1]
        context = jnp.asarray(
            np.broadcast_to(ctx_norm[:, None, :], (batch_size, pad, 1)).copy()
            * np.asarray(node_mask)[..., None]
        )
        key, k = jax.random.split(key)
        xh = sampler.run(k, node_mask, num_timesteps=num_timesteps, context=context)
        x = xh[..., :3]
        one_hot = xh[..., 3:8]
        pred = np.asarray(classify(cls_params, jnp.asarray(one_hot), jnp.asarray(x), node_mask))
        target = ctx_norm[:, 0] * mad + mean  # unnormalize conditioning value
        # decode predictions with the classifier's own training-time
        # normalizer when saved (classifier.json); falls back to the
        # generator dataset's norms (identical when trained in-repo on the
        # same dataset — the reference's single-normalizer case)
        cls_mean = float(cls_meta.get("mean", mean))
        cls_mad = float(cls_meta.get("mad", mad))
        mae = float(np.abs(cls_mad * pred + cls_mean - target).mean())
        maes.append(mae)
        log.info(f"iteration {it + 1}/{iterations}: MAE={mae:.4f} (running {np.mean(maes):.4f})")
        if cfg.get("save_molecules", False):
            # keep the generated set for offline analysis (reference
            # mol_gen_eval_conditional_qm9.py save_molecules=True)
            from bio_diffusion_tpu.chem.molecule import save_xyz_files
            from bio_diffusion_tpu.config.build import get_dataset_info_for

            dataset_info = get_dataset_info_for(exp)
            save_xyz_files(
                os.path.join(str(cfg.get("output_dir",
                                         "outputs/mol_gen_eval_conditional_qm9")),
                             "molecules", f"iteration_{it}"),
                x, one_hot, np.asarray(node_mask), dataset_info,
            )

    result = {"property": prop, "mae": float(np.mean(maes)), "mae_per_iteration": maes}
    out_dir = str(cfg.get("output_dir", "outputs/mol_gen_eval_conditional_qm9"))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"conditional_eval_{prop}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"property": prop, "mae": result["mae"]}))
    return result


if __name__ == "__main__":
    main()
