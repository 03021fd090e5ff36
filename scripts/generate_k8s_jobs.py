"""Generate schedulable K8s TPU Job YAMLs from a grid-search manifest or a
single experiment (counterpart of the reference's
scripts/nautilus/generate_*_grid_search_jobs.py + gpu_job_template.yaml,
redesigned for GKE TPU node pools).

Usage:
  # one Job per grid-search run:
  python scripts/generate_k8s_jobs.py --manifest out_dir/grid_manifest.json \
      --out-dir out_dir/k8s [--image IMG] [--num-hosts 1] [--chips-per-host 4] \
      [--accelerator tpu-v5-lite-podslice] [--topology 2x4] [--pvc NAME]

  # a single experiment Job:
  python scripts/generate_k8s_jobs.py --experiment qm9_mol_gen_ddpm \
      --out-dir k8s/ [same flags]

Also emits the PVC YAML (once) and an apply_all.sh.
"""

import json
import os
import re
import sys

TEMPLATE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "k8s")

DEFAULTS = {
    "IMAGE": "gcr.io/my-project/bio-diffusion-tpu:latest",
    "NUM_HOSTS": "1",
    "TPU_CHIPS_PER_HOST": "4",
    "TPU_ACCELERATOR": "tpu-v5-lite-podslice",
    "TPU_TOPOLOGY": "2x2",
    "MEMORY": "48Gi",
    "CPU": "8",
    "PVC_NAME": "bio-diffusion-tpu-pvc",
    "STORAGE": "200Gi",
    "STORAGE_CLASS": "standard-rwx",
}


def render(template: str, subs: dict) -> str:
    out = template
    # longest-first so $TPU_CHIPS_PER_HOST is not clobbered by $TPU_CHIPS
    for key in sorted(subs, key=len, reverse=True):
        out = out.replace(f"${key}", str(subs[key]))
    leftover = sorted(set(re.findall(r"\$[A-Z_]+", out)))
    if leftover:
        raise ValueError(f"unsubstituted template variables: {leftover}")
    return out


def job_name(run_id: str) -> str:
    # RFC 1123: lowercase alphanumerics and '-'
    name = re.sub(r"[^a-z0-9-]+", "-", run_id.lower()).strip("-")
    return f"bio-diffusion-tpu-{name}"[:63].rstrip("-")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def opt(flag, default=None):
        if flag in argv:
            return argv[argv.index(flag) + 1]
        return default

    manifest_path = opt("--manifest")
    experiment = opt("--experiment")
    out_dir = opt("--out-dir")
    if not out_dir or not (manifest_path or experiment):
        print(__doc__)
        sys.exit(1)

    subs = dict(DEFAULTS)
    subs["IMAGE"] = opt("--image", subs["IMAGE"])
    subs["NUM_HOSTS"] = opt("--num-hosts", subs["NUM_HOSTS"])
    subs["TPU_CHIPS_PER_HOST"] = opt("--chips-per-host", subs["TPU_CHIPS_PER_HOST"])
    subs["TPU_ACCELERATOR"] = opt("--accelerator", subs["TPU_ACCELERATOR"])
    subs["TPU_TOPOLOGY"] = opt("--topology", subs["TPU_TOPOLOGY"])
    subs["PVC_NAME"] = opt("--pvc", subs["PVC_NAME"])
    multihost = int(subs["NUM_HOSTS"]) > 1

    with open(os.path.join(TEMPLATE_DIR, "tpu_job_template.yaml")) as f:
        job_tmpl = f.read()
    with open(os.path.join(TEMPLATE_DIR, "persistent_storage_template.yaml")) as f:
        pvc_tmpl = f.read()
    with open(os.path.join(TEMPLATE_DIR, "headless_service_template.yaml")) as f:
        svc_tmpl = f.read()

    runs = []
    if manifest_path:
        with open(manifest_path) as f:
            for entry in json.load(f):
                runs.append((entry["run_id"], entry["cmd"]))
    else:
        cmd = (
            f"python -m bio_diffusion_tpu.cli.train experiment={experiment} "
            f"--workdir=/data/runs/{experiment}"
        )
        runs.append((experiment, cmd))

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    pvc_path = os.path.join(out_dir, "persistent_storage.yaml")
    with open(pvc_path, "w") as f:
        f.write(render(pvc_tmpl, subs))
    paths.append(pvc_path)

    for run_id, cmd in runs:
        if multihost:
            cmd += " trainer.multihost=true"
        rsubs = dict(subs, JOB_NAME=job_name(run_id), COMMAND=json.dumps(cmd))
        path = os.path.join(out_dir, f"job_{run_id}.yaml")
        with open(path, "w") as f:
            f.write(render(job_tmpl, rsubs))
        paths.append(path)
        if multihost:
            # per-pod DNS ($JOB_NAME-0.$JOB_NAME) requires a headless Service
            # with a matching job-name selector — without it the coordinator
            # address never resolves and jax.distributed.initialize hangs
            svc_path = os.path.join(out_dir, f"service_{run_id}.yaml")
            with open(svc_path, "w") as f:
                f.write(render(svc_tmpl, rsubs))
            paths.append(svc_path)

    apply_sh = os.path.join(out_dir, "apply_all.sh")
    with open(apply_sh, "w") as f:
        f.write("#!/bin/bash\nset -e\n")
        for p in paths:
            f.write(f"kubectl apply -f {os.path.basename(p)}\n")
    os.chmod(apply_sh, 0o755)
    print(f"wrote {len(paths)} YAMLs + apply_all.sh to {out_dir}")
    return paths


if __name__ == "__main__":
    main()
