"""Training runtime: train state, jitted steps, checkpointing, loop."""

from bio_diffusion_tpu.train.state import (
    TrainState,
    adaptive_clip,
    create_train_state,
    ema_update,
    make_optimizer,
)
from bio_diffusion_tpu.train.step import make_eval_step, make_loss_fn, make_train_step

__all__ = [
    "TrainState", "adaptive_clip", "create_train_state", "ema_update",
    "make_optimizer", "make_eval_step", "make_loss_fn", "make_train_step",
]
