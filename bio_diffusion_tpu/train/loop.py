"""The training loop: epochs, validation, EMA-weight eval, sampling eval,
checkpointing, halt files.

Counterpart of the reference's Lightning Trainer + QM9/GEOM task modules
(qm9_mol_gen_ddpm.py / geom_mol_gen_ddpm.py orchestration): per-epoch train
+ NLL validation on EMA weights (the EMA callback swaps weights for eval),
rank-zero sampling evaluation every ``eval_epochs``, periodic checkpoints,
and a ``<run>.done`` halt file on fit end for grid-search monitors.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.config.build import (
    ExperimentConfig,
    build_evd,
    build_datasets,
    get_dataset_info_for,
)
from bio_diffusion_tpu.data.batch import iterate_dense_batches
from bio_diffusion_tpu.models.distributions import (
    NumNodesDistribution,
    PropertiesDistribution,
    compute_mean_mad,
)
from bio_diffusion_tpu.train.checkpoints import latest_step, restore_checkpoint, save_checkpoint
from bio_diffusion_tpu.train.sampling import SegmentedSampler, analyze_samples, sample_molecules
from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
from bio_diffusion_tpu.train.step import make_eval_step, make_train_step
from bio_diffusion_tpu.utils.logging import CSVLogger, MetricLoggers, get_logger

log = get_logger(__name__)

HALT_FILE_EXTENSION = "done"


class Trainer:
    """Single-host trainer; multi-device via mesh shardings on the batch."""

    def __init__(
        self,
        exp: ExperimentConfig,
        workdir: str,
        datasets: Optional[Dict[str, Any]] = None,
        mesh=None,
        loggers=None,
    ):
        self.exp = exp
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.datasets = datasets if datasets is not None else build_datasets(exp)
        self.dataset_info = get_dataset_info_for(exp)
        self.mesh = mesh
        self.evd = build_evd(exp)
        # sampling uses a no-remat twin (same params; remat only helps training)
        self.evd_sample = build_evd(exp, remat=False)

        hist = {int(k): int(v) for k, v in self.dataset_info["n_nodes"].items()}
        self.nodes_dist = NumNodesDistribution(hist)

        self.conditioning = tuple(exp.module_cfg.conditioning)
        self.props_norms = None
        self.props_distr = None
        if self.conditioning:
            # mean/MAD from train (QM9) or valid (QM9_second_half) split
            # (reference compute_mean_mad, models/__init__.py:49-59)
            split = "valid" if exp.dataloader_cfg.dataset == "QM9_second_half" else "train"
            ds = self.datasets[split]
            self.props_norms = {
                p: compute_mean_mad(ds.property_values(p)) for p in self.conditioning
            }
            train_ds = self.datasets["train"]
            self.props_distr = PropertiesDistribution(
                train_ds.data["num_atoms"],
                {p: train_ds.property_values(p) for p in self.conditioning},
                normalizer=self.props_norms,
            )

        # fast training path (VERDICT r1 item 5): same param tree, wide
        # packed-layout forward through FastGCPNetDynamics.  On a single TPU
        # chip (auto/pallas) the message layer runs the Pallas mega-kernel
        # forward + the handwritten Pallas backward kernel; under a mesh or
        # off-TPU, packed-XLA differentiation (GSPMD-partitionable).  "on"
        # forces packed XLA everywhere.  Numbers in BASELINE.md.
        self.evd_train = self.evd
        if exp.trainer.fast_train in ("auto", "on", "pallas"):
            from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
            from bio_diffusion_tpu.models.gcpnet_fast import (
                FastGCPNetDynamics, supports_fast_path,
            )

            dyn = self.evd.dynamics
            supported = isinstance(dyn, GCPNetDynamics) and supports_fast_path(
                dyn.module_cfg, dyn.layer_cfg
            )
            if supported:
                single = mesh is None or int(np.prod(list(mesh.shape.values()))) == 1
                data_only = (not single) and mesh.shape.get("model", 1) == 1
                on_tpu = jax.devices()[0].platform == "tpu"
                # auto on a single TPU chip: Pallas fwd + handwritten Pallas
                # bwd kernel (47.5 vs 51.0 ms/step packed-XLA on v5e B=64
                # QM9, with remat-level memory).  On a DATA-ONLY mesh the
                # kernel runs per-shard under jax.shard_map (the 47.5 ms
                # path survives multi-chip DP); with model sharding or
                # off-TPU: packed XLA (GSPMD-partitionable).
                use_pallas = (
                    exp.trainer.fast_train in ("auto", "pallas")
                    and on_tpu
                    and (single or data_only)
                )
                self.evd_train = self.evd.clone(
                    dynamics=FastGCPNetDynamics(
                        dyn.model_cfg, dyn.module_cfg, dyn.layer_cfg,
                        dyn.diffusion_cfg, dyn.dataloader_cfg,
                        compute_dtype=dyn.compute_dtype,
                        use_pallas=use_pallas,
                        mesh=mesh if (use_pallas and not single) else None,
                    )
                )
                log.info(
                    "fast train path: packed-layout dynamics "
                    f"(pallas={'on' if use_pallas else 'off'}"
                    f"{', shard_map' if use_pallas and not single else ''})"
                )
            elif exp.trainer.fast_train in ("on", "pallas"):
                raise ValueError(f"trainer.fast_train={exp.trainer.fast_train} but "
                                 "the model config is not supported by the fast path")

        self.optimizer = make_optimizer(exp.optimizer)
        self.accumulate_grad_batches = max(1, int(exp.trainer.accumulate_grad_batches))
        self.train_step = make_train_step(
            self.evd_train, self.optimizer, exp.diffusion_cfg, exp.dataloader_cfg,
            self.nodes_dist.log_prob_table,
            ema_decay=exp.trainer.ema_decay,
            clip_gradients=exp.module_cfg.clip_gradients,
            accumulate_grad_batches=self.accumulate_grad_batches,
        )
        # eval NLL through the same packed path as training (identical params)
        self.eval_step = make_eval_step(
            self.evd_train, exp.diffusion_cfg, exp.dataloader_cfg,
            self.nodes_dist.log_prob_table,
        )
        self.loggers = loggers or MetricLoggers(CSVLogger(os.path.join(workdir, "metrics.csv")))

        self.rng = np.random.default_rng(exp.seed)
        self.state = None
        self._eval_sampler = None  # lazily-built packed-path sampler, reused across evals
        self._overfit_cache = None  # first-k train batches for overfit_batches
        self._molecular_metrics = None  # lazily-built RDKit metrics (or False)

    # -- setup ---------------------------------------------------------------

    def _batch_iter(self, split: str, shuffle: bool = True):
        dl = self.exp.dataloader_cfg
        pad_to = None
        if "QM9" in dl.dataset or dl.dataset == "synthetic":
            pad_to = self.datasets[split].data["positions"].shape[1]
        return iterate_dense_batches(
            self.datasets[split],
            batch_size=dl.batch_size,
            rng=self.rng,
            shuffle=shuffle and dl.shuffle,
            drop_last=dl.drop_last if split == "train" else False,
            pad_to=pad_to,
            pad_to_multiple=dl.pad_to_multiple,
            bucket_sizes=dl.bucket_sizes,
            conditioning=self.conditioning,
            property_norms=self.props_norms,
        )

    def _shard(self, batch):
        from bio_diffusion_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def init_state(self, resume: bool = True):
        exp = self.exp
        batch = next(self._batch_iter("train"))
        key = jax.random.PRNGKey(exp.seed)
        from bio_diffusion_tpu.ops.geometry import centralize

        # init through the loss path contract: x arrives CoM-free (the same
        # centralize the train step applies; keeps debug invariants valid)
        _, x0 = centralize(jnp.asarray(batch.x), jnp.asarray(batch.node_mask))
        params = self.evd.init(
            key, x0, jnp.asarray(batch.one_hot), jnp.asarray(batch.charges),
            jnp.asarray(batch.node_mask), key, training=True,
            context=None if batch.context is None else jnp.asarray(batch.context),
        )
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        log.info(f"Initialized model with {n_params:,} parameters")
        self.state = create_train_state(params, self.optimizer)

        ckpt_dir = os.path.join(self.workdir, exp.trainer.ckpt_dir)
        if resume and latest_step(ckpt_dir) is not None:
            self.state = restore_checkpoint(ckpt_dir, self.state)
            log.info(f"Resumed from checkpoint step {int(self.state.step)}")
        elif exp.trainer.warm_start_ckpt:
            # partial (strict=False) warm start: pretrain -> finetune flows
            from bio_diffusion_tpu.train.checkpoints import warm_start_params

            merged, n_loaded, skipped = warm_start_params(
                exp.trainer.warm_start_ckpt, params,
                source=exp.trainer.warm_start_source,
            )
            log.info(
                f"Warm start from {exp.trainer.warm_start_ckpt}: "
                f"{n_loaded} leaves loaded, {len(skipped)} kept fresh"
                + (f" (e.g. {skipped[:3]})" if skipped else "")
            )
            self.state = create_train_state(merged, self.optimizer)
        if self.mesh is not None:
            # place the whole state on the mesh (after any restore, so fresh
            # and resumed leaves get consistent shardings)
            from bio_diffusion_tpu.parallel.mesh import param_sharding_rules, shard_pytree

            self.state = shard_pytree(
                self.state, param_sharding_rules(self.state, self.mesh)
            )
        return self.state

    # -- phases ---------------------------------------------------------------

    def _limited(self, iterator, limit: float, split: str = "train"):
        """Yield at most ``limit`` batches: a fraction (< 1.0) of the split's
        batch count, or an absolute count (>= 1, Lightning int semantics —
        the RAW config value's int/float type disambiguates ``1`` = one batch
        from ``1.0`` = the full split)."""
        exp = self.exp
        if exp.trainer.fast_dev_run:
            for i, b in enumerate(iterator):
                if i >= 1:
                    break
                yield b
            return
        key = {"train": "limit_train_batches", "valid": "limit_val_batches",
               "test": "limit_test_batches"}[split]
        raw = exp.raw.get("trainer", {}).get(key, limit)
        if isinstance(raw, int) and not isinstance(raw, bool) and raw >= 1:
            cap = int(raw)  # int 1 caps at ONE batch (Lightning semantics)
        elif limit >= 1.0 and float(limit) == 1.0:
            yield from iterator
            return
        elif limit >= 1.0:
            cap = int(limit)
        else:
            # fraction of the split's batch count, computed from the dataset
            # length (no materialization of the epoch's batches)
            dl = exp.dataloader_cfg
            m = len(self.datasets[split])
            if split == "train" and dl.drop_last:
                total = m // dl.batch_size
            else:
                total = (m + dl.batch_size - 1) // dl.batch_size
            cap = max(1, int(total * limit))
        for i, b in enumerate(iterator):
            if i >= cap:
                break
            yield b

    def train_epoch(self, epoch: int, max_steps: Optional[int] = None) -> Dict[str, float]:
        exp = self.exp
        key = jax.random.PRNGKey(exp.seed + 1)
        metrics_acc: Dict[str, list] = {}
        n_batches = 0
        accum = self.accumulate_grad_batches
        micro: list = []
        if exp.trainer.overfit_batches > 0:
            # reference overfit_batches: the SAME first-k batches every epoch
            if self._overfit_cache is None:
                it = self._batch_iter("train", shuffle=False)
                self._overfit_cache = [
                    b for _, b in zip(range(exp.trainer.overfit_batches), it)
                ]
            batch_iter = iter(self._overfit_cache)
        else:
            batch_iter = self._limited(
                self._batch_iter("train"), exp.trainer.limit_train_batches
            )
        # host-side step counter for the max_steps check: `int(state.step)`
        # is a device->host sync, and over the remote-TPU tunnel one round
        # trip per step dominated the loop (~10x the device step time).
        # The optimizer step count advances by exactly 1 per train_step, so
        # one sync at epoch start suffices.
        host_step = int(self.state.step) if max_steps is not None else 0
        for batch in batch_iter:
            if accum > 1:
                # reference accumulate_grad_batches (trainer/default.yaml:29):
                # k consecutive loader batches -> one clipped optimizer step
                micro.append(self._shard(batch))
                if len(micro) < accum:
                    continue
                self.state, metrics = self.train_step(self.state, micro, key)
                micro = []
            else:
                self.state, metrics = self.train_step(self.state, self._shard(batch), key)
            n_batches += 1
            host_step += 1
            for k, v in metrics.items():
                metrics_acc.setdefault(k, []).append(v)
            if max_steps is not None and host_step >= max_steps:
                break
        # materialize at epoch end only (no per-step host syncs)
        out = {k: float(np.mean([np.asarray(v) for v in vs])) for k, vs in metrics_acc.items()}
        if n_batches == 0:  # e.g. dataset smaller than accumulate_grad_batches
            log.warning(f"epoch {epoch}: no optimizer steps ran")
            return out
        loss = out.get("loss", float("nan"))
        if not np.isfinite(loss):
            raise FloatingPointError(f"Non-finite training loss at epoch {epoch}: {loss}")
        self.loggers.log({f"train/{k}": v for k, v in out.items()}, int(self.state.step), epoch)
        return out

    def validate(self, epoch: int, split: str = "valid", use_ema: bool = True) -> Dict[str, float]:
        params = self.state.ema_params if use_ema else self.state.params
        key = jax.random.PRNGKey(self.exp.seed + 2)
        accs: Dict[str, list] = {}
        limit = (self.exp.trainer.limit_test_batches if split == "test"
                 else self.exp.trainer.limit_val_batches)
        batch_iter = self._limited(self._batch_iter(split, shuffle=False), limit, split=split)
        for i, batch in enumerate(batch_iter):
            info = self.eval_step(params, self._shard(batch), jax.random.fold_in(key, i))
            for k, v in info.items():
                accs.setdefault(k, []).append(np.asarray(v))
        out = {k: float(np.mean(vs)) for k, vs in accs.items()}
        # log-SNR endpoints diagnostic (reference validation_step :446-451)
        dc = self.exp.diffusion_cfg
        if dc.noise_schedule != "learned":
            from bio_diffusion_tpu.ops.schedules import predefined_gamma_table

            table = predefined_gamma_table(dc.noise_schedule, dc.num_timesteps, dc.noise_precision)
            out["log_SNR_max"] = float(-table[0])
            out["log_SNR_min"] = float(-table[-1])
        self.loggers.log({f"{split}/{k}": v for k, v in out.items()}, int(self.state.step), epoch)
        return out

    def _get_molecular_metrics(self):
        """RDKit validity/uniqueness/novelty metrics for in-training sampling
        eval (reference analyze_samples, qm9_mol_gen_ddpm.py:845-885) — built
        once when RDKit is importable, else None."""
        if self._molecular_metrics is None:
            from bio_diffusion_tpu.chem.rdkit_bridge import build_molecular_metrics

            self._molecular_metrics = build_molecular_metrics(
                self.dataset_info, self.exp.dataloader_cfg.smiles_filepath
            ) or False
        return self._molecular_metrics or None

    def evaluate_sampling(self, epoch: int, num_samples: Optional[int] = None) -> Dict[str, float]:
        exp = self.exp
        num_samples = num_samples or exp.diffusion_cfg.num_eval_samples
        # In-training sampling eval runs the TRAINABLE packed forward
        # (evd_train, FastGCPNetDynamics) with params as jit ARGUMENTS: no
        # baked-weight recompile across epochs, and ~1.7x faster than the
        # module path.  fast='off' stops SegmentedSampler from swapping in
        # the baked-constant inference path.  Falls back to the module twin
        # when the config has no fast path.
        if self._eval_sampler is None:
            from bio_diffusion_tpu.models.gcpnet_fast import FastGCPNetDynamics

            dyn = self.evd_train.dynamics
            if isinstance(dyn, FastGCPNetDynamics):
                # the trainable dynamics carries the training mesh (kernel
                # per-shard under shard_map); the sampler shards its batch
                # inputs over the same mesh, so in-training sampling eval
                # scales out with training
                sampling_evd = self.evd.clone(dynamics=dyn)
            else:
                sampling_evd = self.evd_sample
            self._eval_sampler = SegmentedSampler(
                sampling_evd, self.state.ema_params, fast="off",
                mesh=getattr(sampling_evd.dynamics, "mesh", None),
            )
        sampler = self._eval_sampler
        sampler.params = self.state.ema_params
        xh, node_mask, _ = sample_molecules(
            sampler,
            jax.random.PRNGKey(exp.seed + 3 + epoch),
            num_samples,
            self.nodes_dist,
            self.rng,
            batch_size=exp.diffusion_cfg.eval_batch_size,
            props_distr=self.props_distr,
        )
        metrics = analyze_samples(
            xh, node_mask, self.dataset_info,
            include_charges=exp.dataloader_cfg.include_charges,
            molecular_metrics=self._get_molecular_metrics(),
        )
        self.loggers.log({f"val/{k}": v for k, v in metrics.items()}, int(self.state.step), epoch)
        log.info(f"Sampling eval @epoch {epoch}: {metrics}")

        # periodic sample visualization (reference sample_and_save,
        # qm9_mol_gen_ddpm.py:887-954): dump the first few sampled molecules
        # as xyz + rendered PNGs under <workdir>/media/epoch_<e>
        viz_every = exp.diffusion_cfg.visualize_sample_epochs
        if viz_every and epoch % viz_every == 0:
            try:
                from bio_diffusion_tpu.chem.molecule import save_xyz_files
                from bio_diffusion_tpu.chem.visualization import visualize_mols

                n_viz = min(exp.diffusion_cfg.num_visualization_samples, len(xh))
                media_dir = os.path.join(self.workdir, "media", f"epoch_{epoch}")
                k = len(self.dataset_info["atom_decoder"])
                save_xyz_files(
                    media_dir, xh[:n_viz, :, :3], xh[:n_viz, :, 3:3 + k],
                    node_mask[:n_viz], self.dataset_info,
                )
                visualize_mols(media_dir, self.dataset_info, max_num=n_viz)
            except Exception as e:  # viz is best-effort; never kill training
                log.warning(f"sample visualization failed: {e}")
        return metrics

    # -- fit --------------------------------------------------------------------

    def fit(self, max_epochs: Optional[int] = None, max_steps: Optional[int] = None):
        exp = self.exp
        max_epochs = max_epochs if max_epochs is not None else exp.trainer.max_epochs
        if exp.trainer.fast_dev_run:
            # reference trainer.fast_dev_run: 1 train + 1 val batch, one
            # epoch, no checkpoints (configs/debug/fdr.yaml)
            if self.state is None:
                self.init_state(resume=False)
            m = self.train_epoch(0)
            v = self.validate(0)
            log.info(f"fast_dev_run: train={m.get('loss'):.4f} val={v.get('loss'):.4f}")
            return self.state
        if self.state is None:
            self.init_state()
        ckpt_dir = os.path.join(self.workdir, exp.trainer.ckpt_dir)

        # early stopping state (reference configs/callbacks/early_stopping.yaml)
        monitor = exp.trainer.early_stopping_monitor
        mode_sign = -1.0 if exp.trainer.early_stopping_mode == "max" else 1.0
        best_monitor = float("inf")
        bad_checks = 0

        for epoch in range(max_epochs):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch, max_steps=max_steps)
            log.info(
                f"epoch {epoch}: loss={train_metrics.get('loss', float('nan')):.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            if (epoch + 1) % exp.trainer.check_val_every_n_epoch == 0:
                val_metrics = self.validate(epoch)
                if exp.diffusion_cfg.sample_during_training and (
                    (epoch + 1) % exp.diffusion_cfg.eval_epochs == 0
                ):
                    self.evaluate_sampling(epoch)
                if monitor:
                    # monitor names the logged metric ("val/loss" == validate()
                    # key "loss"); min_epochs gates stopping, like Lightning
                    key = monitor.split("/", 1)[-1]
                    value = val_metrics.get(key)
                    if value is None:
                        log.warning(f"early stopping: metric {monitor!r} not found")
                    else:
                        if exp.trainer.early_stopping_check_finite and not np.isfinite(value):
                            log.error(f"early stopping: {monitor}={value} is not finite")
                            break
                        score = mode_sign * value
                        if score < best_monitor - exp.trainer.early_stopping_min_delta:
                            best_monitor = score
                            bad_checks = 0
                        else:
                            bad_checks += 1
                            if (
                                bad_checks >= exp.trainer.early_stopping_patience
                                and epoch + 1 >= exp.trainer.min_epochs
                            ):
                                log.info(
                                    f"early stopping at epoch {epoch}: {monitor} did not "
                                    f"improve for {bad_checks} checks"
                                )
                                break
            if (epoch + 1) % exp.trainer.ckpt_every_n_epochs == 0:
                save_checkpoint(ckpt_dir, self.state)
            if max_steps is not None and int(self.state.step) >= max_steps:
                break

        save_checkpoint(ckpt_dir, self.state)
        self._write_halt_file()
        return self.state

    def _write_halt_file(self):
        """Grid-search completion signal (reference on_fit_end,
        qm9_mol_gen_ddpm.py:1306-1321)."""
        grid_dir = (self.exp.raw.get("paths") or {}).get("grid_search_script_dir")
        if grid_dir:
            os.makedirs(grid_dir, exist_ok=True)
            run_id = self.exp.raw.get("task_name", "run")
            with open(os.path.join(grid_dir, f"{run_id}.{HALT_FILE_EXTENSION}"), "w") as f:
                f.write("`on_fit_end` has been called.")
