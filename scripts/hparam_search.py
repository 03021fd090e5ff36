"""Hyperparameter search driver (counterpart of the reference's Optuna
sweeper, configs/hparams_search/qm9_optuna.yaml + `python train.py -m
hparams_search=...`).

Runs n_trials training runs, each with sampled overrides, optimizing a
metric read from each run's metrics.csv.  The study persists to
<out_dir>/study.json, so interrupted searches resume.

Usage:
  python scripts/hparam_search.py space.json out_dir/ \
      [--n-trials 20] [--metric val/loss] [--direction minimize] \
      [--sampler tpe|random] [--startup-trials 10] [--reduce last|min] \
      [--max-epochs N] [-- extra train-CLI overrides...]

space.json example (reference Optuna params syntax):
  {"model.optimizer.lr": "interval(1e-5, 1e-2, log)",
   "datamodule.dataloader_cfg.batch_size": "choice(32, 64, 128)",
   "model.model_cfg.num_encoder_layers": "int_interval(2, 9)"}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_diffusion_tpu.utils.hparam import Study, read_metric_from_csv  # noqa: E402


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = []
    if "--" in argv:
        i = argv.index("--")
        argv, extra = argv[:i], argv[i + 1:]
    if len(argv) < 2:
        print(__doc__)
        sys.exit(1)
    space_path, out_dir = argv[0], argv[1]

    def opt(flag, default):
        if flag in argv:
            return argv[argv.index(flag) + 1]
        return default

    n_trials = int(opt("--n-trials", 20))
    metric = opt("--metric", "val/loss")
    direction = opt("--direction", "minimize")
    sampler = opt("--sampler", "tpe")
    startup = int(opt("--startup-trials", 10))
    reduce = opt("--reduce", "last")
    max_epochs = opt("--max-epochs", None)

    with open(space_path) as f:
        space = json.load(f)

    os.makedirs(out_dir, exist_ok=True)
    study = Study(
        space, direction=direction, sampler=sampler, n_startup_trials=startup,
        path=os.path.join(out_dir, "study.json"),
    )

    from bio_diffusion_tpu.cli.train import main as train_main

    start = len([t for t in study.trials if t.get("value") is not None])
    for i in range(start, n_trials):
        params = study.suggest()
        run_dir = os.path.join(out_dir, f"trial_{i:04d}")
        overrides = [f"{k}={v}" for k, v in params.items()] + list(extra)
        args = overrides + [f"--workdir={run_dir}"]
        if max_epochs is not None:
            args.append(f"--max-epochs={max_epochs}")
        print(f"[trial {i}] {params}")
        try:
            train_main(args)
            value = read_metric_from_csv(
                os.path.join(run_dir, "metrics.csv"), metric, reduce=reduce
            )
        except Exception as e:  # failed trials score worst, search continues
            print(f"[trial {i}] FAILED: {e}")
            value = float("inf") if direction == "minimize" else float("-inf")
        study.record(params, value)
        print(f"[trial {i}] {metric}={value}")

    best = study.best_trial()
    print(f"best trial: {json.dumps(best, indent=2)}")
    with open(os.path.join(out_dir, "best_trial.json"), "w") as f:
        json.dump(best, f, indent=2)


if __name__ == "__main__":
    main()
