"""Execute the remaining offline-testable analysis/IO helpers that no other
test drives: bust-CSV comparison + plotting (reference
src/analysis/bust_analysis.py), optimization-history plotting
(mol_gen_eval_optimization_qm9 output), QM recomputation aggregation
(src/analysis/qm_analysis.py, external tools monkeypatched), xyz loading
(src/datamodules/components/edm/rdkit_functions.py load paths), and the
jax.profiler trace context.  External-tool wrappers themselves (psi4 /
crest / openbabel / PoseBusters invocations) stay untested here — the
binaries are not installed, mirroring the reference's situation.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def _write_bust_csv(path, rate):
    """Synthetic PoseBusters results: first two checks pass at ``rate``."""
    from bio_diffusion_tpu.analysis.inference_analysis import POSEBUSTERS_COLUMNS

    n = 20
    rows = {c: [True] * n for c in POSEBUSTERS_COLUMNS[:4]}
    k = int(rate * n)
    rows[POSEBUSTERS_COLUMNS[0]] = [True] * k + [False] * (n - k)
    pd.DataFrame(rows).to_csv(path, index=False)


def test_compare_bust_csvs(tmp_path):
    from bio_diffusion_tpu.analysis.comparison_analysis import compare_bust_csvs

    a, b = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    _write_bust_csv(a, 0.9)
    _write_bust_csv(b, 0.5)
    png = str(tmp_path / "cmp.png")
    out = compare_bust_csvs(a, b, labels=("gcdm", "geoldm"), out_png=png)
    assert abs(out["gcdm"]["mol_pred_loaded"] - 0.9) < 1e-9
    assert abs(out["geoldm"]["mol_pred_loaded"] - 0.5) < 1e-9
    # pb_valid = all checks pass
    assert abs(out["geoldm"]["pb_valid"] - 0.5) < 1e-9
    assert os.path.getsize(png) > 0


def test_plot_optimization_history(tmp_path):
    from bio_diffusion_tpu.analysis.comparison_analysis import plot_optimization_history

    paths = []
    for prop, stab, mae in [("alpha", 0.9, 2.5), ("gap", 0.85, 1.1)]:
        p = str(tmp_path / f"{prop}.json")
        with open(p, "w") as f:
            json.dump({"property": prop, "final": {"mol_stable": stab, "mae": mae}}, f)
        paths.append(p)
    png = str(tmp_path / "opt.png")
    plot_optimization_history(paths, png, compare_to_paper=True)
    assert os.path.getsize(png) > 0


def test_qm_recompute_directory_aggregates(tmp_path, monkeypatch):
    """recompute_directory maps the QM property function over the xyz dir in
    sorted order; the psi4 wrapper is monkeypatched (binary not installed)."""
    import bio_diffusion_tpu.analysis.qm_analysis as qm

    for i, name in enumerate(["b.xyz", "a.xyz"]):
        (tmp_path / name).write_text("1\ncomment\nC 0.0 0.0 0.0\n")
    monkeypatch.setattr(
        qm, "compute_polarizability_psi4",
        lambda path: float(ord(os.path.basename(path)[0])),
    )
    vals = qm.recompute_directory(str(tmp_path), method="psi4")
    assert vals == [97.0, 98.0]  # a.xyz then b.xyz — proves sorted order


def test_load_molecule_xyz(tmp_path):
    from bio_diffusion_tpu.chem.molecule import load_molecule_xyz
    from bio_diffusion_tpu.data.dataset_info import get_dataset_info

    info = get_dataset_info("QM9", False)
    p = tmp_path / "mol.xyz"
    p.write_text("2\nQM9-ish\nC 0.0 0.0 0.0\nO 1.2 0.0 0.0\n")
    pos, one_hot = load_molecule_xyz(str(p), info)
    assert pos.shape == (2, 3) and one_hot.shape == (2, len(info["atom_decoder"]))
    assert one_hot[0, info["atom_encoder"]["C"]] == 1.0
    assert one_hot[1, info["atom_encoder"]["O"]] == 1.0
    assert abs(pos[1, 0] - 1.2) < 1e-6


def test_profile_trace_writes_artifacts(tmp_path):
    """The --profile context produces a trace directory on CPU (remote
    runtimes may refuse; the context degrades to a warning there)."""
    from bio_diffusion_tpu.utils.profiling import profile_trace

    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir):
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    # no-op mode must also work
    with profile_trace(None):
        pass
    if os.path.isdir(log_dir):  # written unless the runtime refused tracing
        assert any(os.scandir(log_dir))
