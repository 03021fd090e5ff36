"""Train state: params + AMSGrad optimizer + EMA + adaptive grad-norm clipping.

Counterparts of the reference's training machinery:
  * AdamW(amsgrad=True, lr=1e-4, wd=1e-12) (configs/model/qm9_mol_gen_ddpm.yaml)
  * per-step EMA of weights, decay 0.9999 (src/utils/__init__.py:71-235)
  * adaptive gradient clipping to 1.5*mean + 2*std of the last 50 grad norms,
    seeded with one large value 3000 (qm9_mol_gen_ddpm.py:147-149, 1266-1304)
    — here the norm history is a fixed-size circular buffer carried in the
    train state so the whole step stays inside one jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bio_diffusion_tpu.config.schema import OptimizerConfig

GRADNORM_QUEUE_LEN = 50
GRADNORM_INIT = 3000.0


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    gradnorm_buffer: jax.Array  # [GRADNORM_QUEUE_LEN]
    gradnorm_count: jax.Array  # scalar int32

    def queue_stats(self):
        """Mean/std over the filled part of the grad-norm history."""
        count = jnp.minimum(self.gradnorm_count, GRADNORM_QUEUE_LEN).astype(jnp.float32)
        idx = jnp.arange(GRADNORM_QUEUE_LEN) < count
        w = idx.astype(jnp.float32)
        mean = jnp.sum(self.gradnorm_buffer * w) / count
        var = jnp.sum((self.gradnorm_buffer - mean) ** 2 * w) / count
        return mean, jnp.sqrt(var)

    def push_gradnorm(self, value):
        pos = self.gradnorm_count % GRADNORM_QUEUE_LEN
        return self.replace(
            gradnorm_buffer=self.gradnorm_buffer.at[pos].set(value),
            gradnorm_count=self.gradnorm_count + 1,
        )


def make_lr_schedule(cfg: OptimizerConfig):
    """Optional LR schedule (reference model.scheduler): returns a float (no
    schedule) or an optax schedule over optimizer steps."""
    if not cfg.scheduler and cfg.warmup_steps <= 0:
        return cfg.lr
    if cfg.scheduler == "step":
        # torch StepLR semantics: lr * gamma^(step // step_size)
        base = optax.exponential_decay(
            cfg.lr, transition_steps=cfg.step_size, decay_rate=cfg.gamma, staircase=True
        )
    elif cfg.scheduler == "cosine":
        base = optax.cosine_decay_schedule(cfg.lr, decay_steps=max(cfg.step_size, 1))
    elif cfg.scheduler in ("", "linear_warmup"):
        base = optax.constant_schedule(cfg.lr)
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warmup, base], [cfg.warmup_steps])
    return base


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """AMSGrad + decoupled weight decay, matching torch AdamW(amsgrad=True),
    with an optional LR schedule (see make_lr_schedule)."""
    if cfg.amsgrad:
        scale = optax.scale_by_amsgrad(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
    else:
        scale = optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
    lr = make_lr_schedule(cfg)
    return optax.chain(
        scale,
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_learning_rate(lr),
    )


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    buffer = jnp.zeros(GRADNORM_QUEUE_LEN, dtype=jnp.float32).at[0].set(GRADNORM_INIT)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        # distinct buffers: params and ema_params are both donated by the
        # jitted train step, so they must not alias
        ema_params=jax.tree.map(lambda x: x.copy(), params),
        gradnorm_buffer=buffer,
        gradnorm_count=jnp.ones((), jnp.int32),
    )


def global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))


def adaptive_clip(state: TrainState, grads, enabled: bool = True):
    """Clip grads to 1.5*mean + 2*std of the recent grad-norm history.

    Returns (clipped_grads, new_state_with_pushed_norm, grad_norm, max_norm).
    Matches the reference's norm-clip semantics (torch clip_grad_norm_):
    scale by max_norm / (norm + 1e-6) only when norm exceeds max_norm; the
    pushed history value is min(norm, max_norm).
    """
    grad_norm = global_norm(grads)
    if not enabled:
        return grads, state, grad_norm, jnp.inf
    mean, std = state.queue_stats()
    max_norm = 1.5 * mean + 2.0 * std
    coef = max_norm / (grad_norm + 1e-6)
    clipped = jax.tree.map(lambda g: jnp.where(coef < 1.0, g * coef, g), grads)
    new_state = state.push_gradnorm(jnp.minimum(grad_norm, max_norm))
    return clipped, new_state, grad_norm, max_norm


def ema_update(ema_params, new_params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params)
