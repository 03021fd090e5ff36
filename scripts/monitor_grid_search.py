"""Halt-file grid-search monitor: report/relaunch unfinished runs.

The Trainer writes `<run_id>.done` into paths.grid_search_script_dir on fit
end (reference on_fit_end halt files, qm9_mol_gen_ddpm.py:1306-1321).
"""

import json
import os
import sys


def main():
    out_dir = sys.argv[1]
    with open(os.path.join(out_dir, "grid_manifest.json")) as f:
        manifest = json.load(f)
    done = {f[:-5] for f in os.listdir(out_dir) if f.endswith(".done")}
    pending = [m for m in manifest if m["run_id"] not in done]
    print(f"{len(manifest) - len(pending)}/{len(manifest)} runs complete")
    for m in pending:
        print("PENDING:", m["cmd"])


if __name__ == "__main__":
    main()
