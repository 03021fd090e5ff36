"""Jitted train/eval steps: loss -> grad -> clip -> AMSGrad -> EMA.

The single-step counterpart of the reference's Lightning training_step +
configure_gradient_clipping + EMA callback, fused into one jit (and sharded
over the mesh by the caller's in_shardings).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig,
    DiffusionConfig,
    compute_num_atom_types,
)
from bio_diffusion_tpu.data.batch import DenseMolBatch
from bio_diffusion_tpu.models.diffusion import assemble_nll
from bio_diffusion_tpu.ops.geometry import centralize
from bio_diffusion_tpu.train.state import TrainState, adaptive_clip, ema_update


def make_loss_fn(
    evd_module,
    diffusion_cfg: DiffusionConfig,
    dataloader_cfg: DataloaderConfig,
    log_pN_table: np.ndarray,
    training: bool,
) -> Callable:
    """Per-batch scalar loss + info dict."""
    T = diffusion_cfg.num_timesteps
    num_atom_types = compute_num_atom_types(dataloader_cfg)
    nsf = num_atom_types + int(dataloader_cfg.include_charges)
    table = jnp.asarray(log_pN_table, dtype=jnp.float32)

    def loss_fn(params, batch: DenseMolBatch, rng):
        _, x = centralize(batch.x, batch.node_mask)
        terms = evd_module.apply(
            params, x, batch.one_hot, batch.charges, batch.node_mask, rng,
            training=training, context=batch.context,
        )
        num_nodes = jnp.sum(batch.node_mask, axis=-1).astype(jnp.int32)
        log_pN = table[jnp.clip(num_nodes, 0, table.shape[0] - 1)]
        nll, info = assemble_nll(
            terms,
            loss_type=diffusion_cfg.loss_type,
            training=training,
            T=T,
            num_x_dims=dataloader_cfg.num_x_dims,
            num_node_scalar_features=nsf,
            log_pN=log_pN,
            norm_training_by_max_nodes=diffusion_cfg.norm_training_by_max_nodes,
        )
        return jnp.mean(nll), info

    return loss_fn


def make_train_step(
    evd_module,
    optimizer: optax.GradientTransformation,
    diffusion_cfg: DiffusionConfig,
    dataloader_cfg: DataloaderConfig,
    log_pN_table: np.ndarray,
    ema_decay: float = 0.9999,
    clip_gradients: bool = True,
    donate: bool = True,
    accumulate_grad_batches: int = 1,
) -> Callable[[TrainState, Any, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step.

    The returned function is pure: (state, batch, rng) -> (state', metrics).
    Under a mesh, shard the batch on the 'data' axis and XLA inserts the
    gradient all-reduce automatically (the loss is a global-batch mean).

    With ``accumulate_grad_batches=k > 1`` (reference
    configs/trainer/default.yaml:29), the returned function instead takes a
    SEQUENCE of k micro-batches: gradients are computed per micro-batch by a
    shared jitted grad fn (per-shape executable cache, so size buckets work),
    averaged, and applied in one clipped optimizer + EMA update — numerically
    the mean-loss big-batch step.
    """
    loss_fn = make_loss_fn(evd_module, diffusion_cfg, dataloader_cfg, log_pN_table, training=True)

    def _apply(state: TrainState, grads, info):
        grads, state, grad_norm, max_norm = adaptive_clip(state, grads, enabled=clip_gradients)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = dict(info)
        metrics["grad_norm"] = grad_norm
        metrics["max_grad_norm"] = max_norm
        return new_state, metrics

    if accumulate_grad_batches <= 1:
        if diffusion_cfg.debug_invariants:
            # debug mode: run the grad computation under checkify; the error
            # flag rides through the jit as a value and is thrown on the host
            from jax.experimental import checkify

            from bio_diffusion_tpu.utils.debug import user_checks

            def _checked(state: TrainState, batch: DenseMolBatch, rng):
                rng = jax.random.fold_in(rng, state.step)
                err, ((_, info), grads) = checkify.checkify(
                    lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p, batch, rng),
                    errors=user_checks,
                )(state.params)
                new_state, metrics = _apply(state, grads, info)
                return new_state, metrics, err

            jitted = jax.jit(_checked, donate_argnums=(0,) if donate else ())

            def train_step(state, batch, rng):
                new_state, metrics, err = jitted(state, batch, rng)
                err.throw()
                return new_state, metrics

            return train_step

        def train_step(state: TrainState, batch: DenseMolBatch, rng):
            rng = jax.random.fold_in(rng, state.step)
            (_, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, rng)
            return _apply(state, grads, info)

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    k = accumulate_grad_batches
    if diffusion_cfg.debug_invariants:
        from jax.experimental import checkify

        from bio_diffusion_tpu.utils.debug import user_checks

        _jgrad = jax.jit(
            lambda params, batch, rng: checkify.checkify(
                lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p, batch, rng),
                errors=user_checks,
            )(params)
        )

        def grad_fn(params, batch, rng):
            err, out = _jgrad(params, batch, rng)
            err.throw()
            return out
    else:
        grad_fn = jax.jit(
            lambda params, batch, rng: jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)
        )
    scale = jax.jit(lambda tree: jax.tree.map(lambda a: a / k, tree))
    accum = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
    apply_fn = jax.jit(_apply, donate_argnums=(0,) if donate else ())

    def train_step(state: TrainState, batches, rng):
        assert len(batches) == k, f"expected {k} micro-batches, got {len(batches)}"
        rng = jax.random.fold_in(rng, state.step)
        grads_sum = None
        infos = []
        for i, batch in enumerate(batches):
            (_, info), grads = grad_fn(state.params, batch, jax.random.fold_in(rng, i))
            grads_sum = grads if grads_sum is None else accum(grads_sum, grads)
            infos.append(info)
        grads = scale(grads_sum)
        info = {key: jnp.mean(jnp.stack([m[key] for m in infos])) for key in infos[0]}
        return apply_fn(state, grads, info)

    return train_step


def make_eval_step(
    evd_module,
    diffusion_cfg: DiffusionConfig,
    dataloader_cfg: DataloaderConfig,
    log_pN_table: np.ndarray,
) -> Callable:
    """Jitted eval step computing the NLL on (typically EMA) params."""
    loss_fn = make_loss_fn(evd_module, diffusion_cfg, dataloader_cfg, log_pN_table, training=False)

    if diffusion_cfg.debug_invariants:
        from jax.experimental import checkify

        from bio_diffusion_tpu.utils.debug import user_checks

        jitted = jax.jit(
            lambda params, batch, rng: checkify.checkify(loss_fn, errors=user_checks)(
                params, batch, rng
            )
        )

        def eval_step(params, batch: DenseMolBatch, rng):
            err, (_, info) = jitted(params, batch, rng)
            err.throw()
            return info

        return eval_step

    def eval_step(params, batch: DenseMolBatch, rng):
        loss, info = loss_fn(params, batch, rng)
        return info

    return jax.jit(eval_step)
