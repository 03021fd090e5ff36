"""Pocket-path quality benchmark: does the trained joint model generate?

VERDICT r4 #8: the pocket e2e test only proves the path *runs* (fast-dev-run).
This script trains the unconditional joint ligand+pocket model (the model
RePaint pocket conditioning samples from — reference delegates this workload
to GCDM-SBDD, README.md:302-304) on the synthetic joint dataset for a few
hundred real steps, then generates ligands into pockets from BOTH the trained
checkpoint and a random initialization and scores ligand atom/molecule
stability — turning "the path runs" into "the path generates", with the
random-init row as the null baseline.

  python scripts/bench_pocket_quality.py                 # TPU, full protocol
  POCKET_STEPS=400 POCKET_SAMPLES=100 POCKET_TIMESTEPS=250 \
  POCKET_BATCH=32 python scripts/bench_pocket_quality.py

POCKET_PRESET=tiny shrinks everything (CPU smoke test).

Prints one JSON line:
  {"trained": {"atm_stable": ..., "mol_stable": ..., "validity": ...},
   "random":  {...}, "steps": N, "final_loss": ...}
"""

import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    preset = os.environ.get("POCKET_PRESET", "full")
    platform = os.environ.get("POCKET_PLATFORM")
    if platform:
        # the axon sitecustomize registers the TPU backend regardless of
        # JAX_PLATFORMS; only the config flag reliably forces CPU (conftest)
        import jax

        jax.config.update("jax_platforms", platform)
    steps = int(os.environ.get("POCKET_STEPS", 6 if preset == "tiny" else 2500))
    n_samples = int(os.environ.get("POCKET_SAMPLES", 2 if preset == "tiny" else 100))
    timesteps = int(os.environ.get("POCKET_TIMESTEPS", 6 if preset == "tiny" else 250))
    batch = int(os.environ.get("POCKET_BATCH", 8 if preset == "tiny" else 16))

    from bio_diffusion_tpu.cli.mol_gen_sample import main as sample_main
    from bio_diffusion_tpu.cli.train import main as train_main

    overrides = [
        "experiment=pocket_mol_gen_ddpm",
        f"datamodule.dataloader_cfg.batch_size={batch}",
        "model.diffusion_cfg.sample_during_training=false",
        # sampling restores EMA params; at the reference decay (0.9999,
        # horizon 10k steps) a few-thousand-step protocol's EMA is still
        # mostly the random init — the first run of this script measured
        # trained==random geometry for exactly that reason.  A 100-step
        # horizon tracks the short run.
        "trainer.ema_decay=0.99",
        "extras.print_config=false",
    ]
    if preset == "mid":
        # the BASELINE.md quality-row configuration: a half-width joint model
        # (400 synthetic-data steps teach it something; full GEOM dims would
        # still be near-random there) with a 2-rung bucket ladder to bound
        # TPU compile count
        overrides += [
            "model.model_cfg.h_hidden_dim=128",
            "model.model_cfg.chi_hidden_dim=16",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.xi_hidden_dim=4",
            "model.model_cfg.num_encoder_layers=2",
            "model.model_cfg.num_decoder_layers=2",
            "datamodule.dataloader_cfg.bucket_sizes=[64,144]",
        ]
    if preset == "tiny":
        overrides += [
            "datamodule.dataloader_cfg.num_train=24",
            "datamodule.dataloader_cfg.num_valid=8",
            "datamodule.dataloader_cfg.num_test=8",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=4",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.xi_hidden_dim=2",
            "model.model_cfg.num_encoder_layers=1",
            "model.diffusion_cfg.num_timesteps=8",
            "trainer.use_mesh=false",
        ]

    workdir = os.environ.get("POCKET_WORKDIR") or tempfile.mkdtemp(prefix="pocket_quality_")
    epochs_needed = max(1, -(-steps * batch // 256) + 1)  # synthetic set = 256 graphs
    train_main(overrides + [
        f"--workdir={workdir}", f"--max-steps={steps}",
        f"--max-epochs={epochs_needed * 4}",
        "trainer.early_stopping_patience=999999",
    ])

    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/loss"]) for r in rows if r.get("train/loss")]
    final_loss = sum(losses[-10:]) / max(1, len(losses[-10:]))

    sample_common = overrides + [
        "ddpm_mode=pocket",
        f"num_samples={n_samples}",
        f"num_timesteps={timesteps}",
        "seed=7",
    ]
    if preset == "tiny":
        sample_common += ["pocket_size=6", "num_nodes=5"]

    result = {"steps": steps, "final_loss": round(final_loss, 4),
              "first_loss": round(losses[0], 4) if losses else None}

    # ground-truth row: the SAME metrics computed on the synthetic joint
    # dataset's own ligands.  This makes the null metrics explicit (the
    # random-walk chains score ~0 valence stability by construction — a
    # trained model cannot beat the data it was trained on) and pins the
    # targets for the discriminating geometric metrics.
    import numpy as np

    from bio_diffusion_tpu.data.pocket import (
        ligand_dataset_info, synthetic_pocket_joint_dataset,
    )
    from bio_diffusion_tpu.train.sampling import (
        analyze_samples, ligand_pocket_geometry,
    )

    ds = synthetic_pocket_joint_dataset("bindingmoad", num_graphs=128, seed=0)
    linfo = ligand_dataset_info("bindingmoad")
    kl_w = len(linfo["atom_decoder"])
    nl_arr = ds.data["num_ligand_atoms"]
    n_max_l = int(nl_arr.max())
    gx = np.zeros((len(nl_arr), n_max_l, 3), np.float32)
    gh = np.zeros((len(nl_arr), n_max_l, kl_w), np.float32)
    gm = np.zeros((len(nl_arr), n_max_l), np.float32)
    px = np.zeros((len(nl_arr), ds.data["positions"].shape[1], 3), np.float32)
    pm = np.zeros((len(nl_arr), ds.data["positions"].shape[1]), np.float32)
    for i, nl in enumerate(nl_arr):
        nl = int(nl)
        npk = int(ds.data["num_atoms"][i]) - nl
        gx[i, :nl] = ds.data["positions"][i, :nl]
        gh[i, :nl] = ds.data["one_hot"][i, :nl, :kl_w]
        gm[i, :nl] = 1.0
        px[i, :npk] = ds.data["positions"][i, nl: nl + npk]
        pm[i, :npk] = 1.0
    gt = analyze_samples(np.concatenate([gx, gh], -1), gm, linfo,
                         include_charges=False)
    gt.update(ligand_pocket_geometry(gx, gm, px, pm))
    keys = ("atm_stable", "mol_stable", "validity", "kl_div_atom_types",
            "lig_nn_dist", "lig_center_rms")
    result["data"] = {k: round(float(gt[k]), 4) for k in keys if k in gt}

    for tag, extra in (
        ("trained", [f"ckpt_path={os.path.join(workdir, 'checkpoints')}"]),
        ("random", []),
    ):
        m = sample_main(sample_common + extra
                        + [f"output_dir={os.path.join(workdir, 'samples_' + tag)}"])
        result[tag] = {k: round(float(m[k]), 4) for k in keys if k in m}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
