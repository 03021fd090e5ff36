"""Training entry point (counterpart of reference src/train.py).

Usage:
  python -m bio_diffusion_tpu.cli.train experiment=qm9_mol_gen_ddpm [k=v ...]

Overrides use the reference's Hydra syntax subset: group selections
(``experiment=...``, ``trainer=...``) and dotted leaves
(``model.diffusion_cfg.num_timesteps=100``).
"""

from __future__ import annotations

import os
import sys

from bio_diffusion_tpu.config.build import build_experiment
from bio_diffusion_tpu.config.loader import default_config_dir, load_config
from bio_diffusion_tpu.train.loop import Trainer
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    config_dir = default_config_dir()
    # pull out special flags
    config_name = "train"
    overrides = []
    workdir = None
    max_epochs = None
    max_steps = None
    profile_dir = None
    dump_graph = False
    for arg in argv:
        if arg.startswith("--config-dir="):
            config_dir = arg.split("=", 1)[1]
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
        elif arg.startswith("--workdir="):
            workdir = arg.split("=", 1)[1]
        elif arg.startswith("--max-epochs="):
            max_epochs = int(arg.split("=", 1)[1])
        elif arg.startswith("--max-steps="):
            max_steps = int(arg.split("=", 1)[1])
        elif arg.startswith("--profile="):
            profile_dir = arg.split("=", 1)[1]
        elif arg == "--dump-graph":
            dump_graph = True
        else:
            overrides.append(arg)

    cfg = load_config(config_dir, config_name, overrides)
    exp = build_experiment(cfg)
    if workdir is None:
        workdir = (cfg.get("paths") or {}).get("output_dir") or "outputs/train"

    # extras: config tree + tag enforcement (reference extras/default.yaml +
    # rich_utils.py)
    extras = cfg.get("extras") or {}
    from bio_diffusion_tpu.utils.logging import build_loggers, enforce_tags, print_config_tree

    enforce_tags(cfg, strict=bool(extras.get("enforce_tags")))
    if extras.get("print_config"):
        print_config_tree(cfg)

    log.info(f"Experiment: dataset={exp.dataloader_cfg.dataset}, "
             f"network={exp.diffusion_cfg.dynamics_network}, "
             f"layers={exp.model_cfg.num_encoder_layers}, workdir={workdir}")

    # distribution: multi-host init first (must precede device queries), then
    # a (data x model) mesh over all devices — the DDP-by-default counterpart
    # of the reference trainer configs (trainer/default.yaml:10, ddp.yaml)
    if exp.trainer.multihost:
        from bio_diffusion_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()
    mesh = None
    if exp.trainer.use_mesh:
        from bio_diffusion_tpu.parallel.mesh import default_mesh

        mesh = default_mesh(num_model_shards=exp.trainer.num_model_shards)
        if mesh is not None:
            log.info(f"Training on mesh {dict(mesh.shape)}")

    trainer = Trainer(exp, workdir, mesh=mesh,
                      loggers=build_loggers(cfg.get("logger"), workdir))
    if dump_graph:
        # compiler's-eye view of the denoiser forward (TPU-native counterpart
        # of the reference's torchviz dump, utils/__init__.py:53-68)
        import jax
        import jax.numpy as jnp

        from bio_diffusion_tpu.utils.profiling import dump_computation_graph

        trainer.init_state()
        b, n = 2, int(trainer.dataset_info["max_n_nodes"])
        k = len(trainer.dataset_info["atom_decoder"])
        nf = 3 + k + (1 if exp.dataloader_cfg.include_charges else 0)
        z = jnp.zeros((b, n, nf))
        paths = dump_computation_graph(
            lambda z: trainer.evd_sample.dynamics.apply(
                {"params": trainer.state.params["params"]["dynamics"]},
                z, jnp.zeros((b, 1)), jnp.ones((b, n)),
            ),
            (z,), os.path.join(workdir, "graph"), name="dynamics",
        )
        log.info(f"Wrote computation graphs: {paths}")
    if exp.trainer.profile and profile_dir is None:
        profile_dir = os.path.join(workdir, "profile")
    from bio_diffusion_tpu.utils.profiling import profile_trace
    import time as _time

    t_start = _time.time()
    with profile_trace(profile_dir):
        trainer.fit(max_epochs=max_epochs, max_steps=max_steps)
    # execution-time record (reference task_wrapper, utils/utils.py:56-58)
    with open(os.path.join(workdir, "exec_time.log"), "w") as f:
        f.write(f"{_time.time() - t_start:.2f}s\n")

    if cfg.get("test"):
        metrics = trainer.validate(epoch=-1, split="test")
        log.info(f"test metrics: {metrics}")


if __name__ == "__main__":
    main()
