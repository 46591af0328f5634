"""Regenerate the flagship quality table (benchmarks/ml100k_quality.json).

The five BASELINE.md flagship configs at their full epoch budgets (the
35-model sweep uses shorter per-family budgets). Makes the last quality
table in RESULTS.md reproducible from a committed script instead of "the
repo history":

  python benchmarks/flagship_quality.py            # all five (skips done)
  python benchmarks/flagship_quality.py --force    # re-run everything
  python benchmarks/flagship_quality.py --one MF
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "ml100k_quality.json")

if REPO not in sys.path:
    sys.path.insert(0, REPO)

from benchmarks.quality_sweep import (  # noqa: E402
    PER_MODEL_TIMEOUT_S,
    drive_models,
    merge_into,
    run_model,
)

# model -> (epochs, extra CLI overrides): the longer flagship budgets
FLAGSHIPS = {
    "MF": (200, []),
    "LightGCN": (150, []),
    "MultiVAE": (150, []),
    "NeuMF": (60, []),
    "SASRec": (100, []),
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="run a single model in-process and merge")
    ap.add_argument("--only", help="driver mode, single model subprocess")
    ap.add_argument("--force", action="store_true",
                    help="drop existing records first (drive_models skips "
                         "models already present, so a committed JSON makes "
                         "the default invocation a no-op)")
    a = ap.parse_args()
    if a.one:
        epochs, extra = FLAGSHIPS[a.one]
        merge_into(OUT, a.one, run_model(a.one, epochs, extra))
        print("done", a.one)
    else:
        if a.force and os.path.exists(OUT):
            import json

            with open(OUT) as f:
                data = json.load(f)
            for name in ([a.only] if a.only else list(FLAGSHIPS)):
                data.pop(name, None)
            with open(OUT, "w") as f:
                json.dump(data, f, indent=1)
                f.write("\n")
        sys.exit(
            drive_models(
                os.path.abspath(__file__), OUT,
                [a.only] if a.only else list(FLAGSHIPS),
                PER_MODEL_TIMEOUT_S,
            )
        )
