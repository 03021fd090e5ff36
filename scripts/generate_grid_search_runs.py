"""Grid-search run generation (counterpart of the reference's
scripts/generate_*_grid_search_runs.py + Nautilus templates).

Takes a JSON search space (lists of values per dotted config key), emits the
itertools product as (a) a JSON manifest and (b) one launch line per run.
Run completion is signaled by `<run_id>.done` halt files written by the
Trainer (train/loop.py) when `paths.grid_search_script_dir` is set, so an
external monitor can re-dispatch unfinished runs.

Usage:
  python scripts/generate_grid_search_runs.py search_space.json out_dir/ \
      [--entry "python -m bio_diffusion_tpu.cli.train experiment=qm9_mol_gen_ddpm"]

search_space.json example:
  {"model.optimizer.lr": [1e-4, 4e-4],
   "model.model_cfg.num_encoder_layers": [4, 9],
   "model.diffusion_cfg.num_timesteps": [1000]}
"""

import itertools
import json
import os
import sys


def main():
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        sys.exit(1)
    space_path, out_dir = args[0], args[1]
    entry = "python -m bio_diffusion_tpu.cli.train"
    if "--entry" in args:
        entry = args[args.index("--entry") + 1]

    with open(space_path) as f:
        space = json.load(f)
    keys = sorted(space)
    combos = list(itertools.product(*(space[k] for k in keys)))

    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    lines = []
    for i, combo in enumerate(combos):
        run_id = f"run_{i:04d}"
        overrides = [f"{k}={v}" for k, v in zip(keys, combo)]
        cmd = (
            f"{entry} {' '.join(overrides)} "
            f"paths.grid_search_script_dir={out_dir} task_name={run_id} "
            f"--workdir={os.path.join(out_dir, run_id)}"
        )
        manifest.append({"run_id": run_id, "overrides": dict(zip(keys, combo)), "cmd": cmd})
        lines.append(cmd)

    with open(os.path.join(out_dir, "grid_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    launch = os.path.join(out_dir, "launch_all.sh")
    with open(launch, "w") as f:
        f.write("#!/bin/bash\nset -e\n" + "\n".join(lines) + "\n")
    os.chmod(launch, 0o755)
    print(f"wrote {len(combos)} runs to {out_dir} (manifest + launch_all.sh)")


if __name__ == "__main__":
    main()
