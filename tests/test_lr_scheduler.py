"""Optional LR schedules + the arithmetic-expression config workaround
(reference model.scheduler, configs/model/qm9_mol_gen_ddpm.yaml:10-15, and
the eval() interpolation workaround in src/train.py:186-196)."""

import numpy as np
import pytest

from bio_diffusion_tpu.config.build import build_experiment, safe_arith
from bio_diffusion_tpu.config.loader import default_config_dir, load_config
from bio_diffusion_tpu.config.schema import OptimizerConfig
from bio_diffusion_tpu.train.state import make_lr_schedule, make_optimizer


def test_safe_arith():
    assert safe_arith("50 // 8") == 6
    assert safe_arith("0.5 * 2e-4") == 1e-4
    assert safe_arith("-3 + 5") == 2
    with pytest.raises(ValueError):
        safe_arith("__import__('os').system('true')")
    with pytest.raises(ValueError):
        safe_arith("lr ** 2")


def test_step_schedule_matches_torch_steplr():
    cfg = OptimizerConfig(lr=1e-3, scheduler="step", step_size=100, gamma=0.5)
    sched = make_lr_schedule(cfg)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(99)), 1e-3)
    assert np.isclose(float(sched(100)), 5e-4)
    assert np.isclose(float(sched(250)), 2.5e-4)


def test_warmup_prepends():
    cfg = OptimizerConfig(lr=1e-3, warmup_steps=10)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), 5e-4)
    assert np.isclose(float(sched(10)), 1e-3)
    assert np.isclose(float(sched(500)), 1e-3)


def test_no_schedule_is_constant_float():
    assert make_lr_schedule(OptimizerConfig(lr=3e-4)) == 3e-4


def test_scheduler_arithmetic_through_config():
    """The reference's commented StepLR block with interpolated arithmetic:
    step_size: ${trainer.min_epochs} // 8."""
    cfg = load_config(default_config_dir(), "train", [
        "model.optimizer.scheduler=step",
        "model.optimizer.step_size=${trainer.min_epochs} // 8",
        "model.optimizer.gamma=0.9",
    ])
    exp = build_experiment(cfg)
    assert exp.optimizer.scheduler == "step"
    assert exp.optimizer.step_size == exp.trainer.min_epochs // 8


def test_scheduled_optimizer_decays_updates():
    """The optimizer actually applies the scheduled LR: update magnitude
    halves after step_size steps with gamma=0.5."""
    import jax.numpy as jnp
    import optax

    cfg = OptimizerConfig(lr=1e-2, scheduler="step", step_size=2, gamma=0.5,
                          weight_decay=0.0)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    g = {"w": jnp.ones(4)}
    # run a few steps; AMSGrad normalizes grads to ~1, so |update| ~ lr(step)
    sizes = []
    for _ in range(4):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        sizes.append(float(jnp.abs(updates["w"]).mean()))
    assert sizes[0] > sizes[-1]
    assert np.isclose(sizes[3] / sizes[0], 0.5, atol=0.1)
