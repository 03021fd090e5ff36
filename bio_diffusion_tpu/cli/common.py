"""Shared CLI plumbing: arg parsing, model construction, checkpoint loading."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.config.build import ExperimentConfig, build_evd, build_experiment, get_dataset_info_for
from bio_diffusion_tpu.config.loader import default_config_dir, load_config
from bio_diffusion_tpu.models.distributions import NumNodesDistribution
from bio_diffusion_tpu.ops.geometry import centralize
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def parse_cli(argv: List[str], config_name: str) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Split args into config overrides and --flags; compose the config.

    ``--help`` prints the entry point's docstring plus the composed default
    config (every key is overridable as ``key=value``), mirroring the
    reference's advertised ``python3 src/<entry>.py --help`` (README.md:139).
    """
    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()  # every CLI reuses compiled executables
    config_dir = default_config_dir()
    overrides, flags = [], {}
    for arg in argv:
        if arg.startswith("--"):
            k, _, v = arg[2:].partition("=")
            flags[k] = v
            if k == "config-dir":
                config_dir = v
            elif k == "config-name":
                config_name = v
        else:
            overrides.append(arg)
    if "help" in flags or "-h" in overrides:
        _print_help(config_dir, config_name)
        raise SystemExit(0)
    cfg = load_config(config_dir, config_name, overrides)
    return cfg, flags


def _print_help(config_dir: str, config_name: str) -> None:
    import inspect
    import sys as _sys

    import yaml

    # the calling entry-point module's docstring is the usage text
    for frame in inspect.stack()[2:]:
        doc = frame.frame.f_globals.get("__doc__")
        mod = frame.frame.f_globals.get("__name__", "")
        if doc and (mod == "__main__" or mod.startswith("bio_diffusion_tpu.cli")):
            print(doc.strip(), file=_sys.stdout)
            break
    print(f"\nDefault config ({config_name}.yaml; any key is a 'key=value' override,"
          f"\ngroups like datamodule/model/logger/experiment re-select group files):\n")
    cfg = load_config(config_dir, config_name, [])
    print(yaml.safe_dump(cfg, default_flow_style=False, sort_keys=False))


def init_params(exp: ExperimentConfig, evd) -> Any:
    """Initialize a params template with a minimal dummy batch."""
    from bio_diffusion_tpu.config.schema import compute_num_atom_types

    key = jax.random.PRNGKey(0)
    B, N = 2, 6
    k = compute_num_atom_types(exp.dataloader_cfg)
    mask = jnp.ones((B, N))
    x = jax.random.normal(key, (B, N, 3))
    _, x = centralize(x, mask)
    ctx = None
    if exp.module_cfg.conditioning:
        ctx = jnp.zeros((B, N, len(exp.module_cfg.conditioning)))
    return evd.init(
        key, x, jnp.zeros((B, N, k)), jnp.zeros((B, N, 1)), mask, key,
        training=True, context=ctx,
    )


def load_model(exp: ExperimentConfig, ckpt_path: Optional[str], prefer_ema: bool = True):
    """Build the EVD and load parameters from any supported checkpoint form:

      * reference PyTorch-Lightning ``.ckpt``/``.pt`` (incl. ``*-EMA.ckpt``)
      * an orbax TrainState checkpoint directory written by our Trainer
      * an orbax standalone params directory
      * None -> freshly initialized params (useful for smoke tests)
    """
    evd = build_evd(exp, remat=False)
    params = init_params(exp, evd)
    if ckpt_path is None:
        log.warning("No ckpt_path given — using randomly initialized parameters")
        return evd, params

    if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
        from bio_diffusion_tpu.train.torch_import import import_torch_checkpoint

        log.info(f"Importing reference torch checkpoint {ckpt_path}")
        return evd, import_torch_checkpoint(ckpt_path, params)

    from bio_diffusion_tpu.train.checkpoints import latest_step, restore_checkpoint, restore_params
    from bio_diffusion_tpu.train.state import create_train_state, make_optimizer

    if latest_step(ckpt_path) is not None:
        optimizer = make_optimizer(exp.optimizer)
        template = create_train_state(params, optimizer)
        state = restore_checkpoint(ckpt_path, template)
        log.info(f"Restored orbax TrainState step {int(state.step)} from {ckpt_path}")
        return evd, (state.ema_params if prefer_ema else state.params)

    log.info(f"Restoring orbax params from {ckpt_path}")
    return evd, restore_params(ckpt_path, params)


def nodes_distribution_for(exp: ExperimentConfig) -> NumNodesDistribution:
    info = get_dataset_info_for(exp)
    hist = {int(k): int(v) for k, v in info["n_nodes"].items()}
    return NumNodesDistribution(hist)


def inference_mesh(cfg: Optional[Dict[str, Any]] = None):
    """Data-parallel mesh over all local devices for the inference CLIs
    (``use_mesh`` config key, default true) — multi-chip sampling/eval
    scale-out the reference does not have (its sampling entry points are
    single-GPU, src/mol_gen_sample.py / src/mol_gen_eval.py).  Returns None
    on a single device, so single-chip behavior (and its jit cache) is
    unchanged."""
    use = True if cfg is None else _truthy(cfg.get("use_mesh", True))
    if not use or len(jax.devices()) <= 1:
        return None
    from bio_diffusion_tpu.parallel.mesh import make_mesh

    return make_mesh(data=len(jax.devices()), model=1)


def _truthy(v: Any) -> bool:
    # same allowlist as config/schema._coerce, so CLI strings and
    # schema-typed bools parse identically
    if isinstance(v, str):
        return v.lower() in ("1", "true", "yes", "on")
    return bool(v)
