"""Flagship quality on the second real dataset (gowalla, 29,858 x 38,546).

Broadens the quality evidence beyond ml-100k: the same shipped-conf models
on the reference's gowalla data (217,242 interactions; per-user 80/20
ratio split by this framework's own pipeline — see gowalla_northstar.py
for the LightGCN story at this scale). Writes
``benchmarks/gowalla_quality.json``:

  python benchmarks/gowalla_quality.py
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "gowalla_quality.json")

if REPO not in sys.path:
    sys.path.insert(0, REPO)

from benchmarks.gowalla_northstar import (  # noqa: E402
    LIGHTGCN_GOWALLA_ARGS,
    ensure_local_copy,
)
from benchmarks.quality_sweep import (  # noqa: E402
    PER_MODEL_TIMEOUT_S,
    drive_models,
    merge_into,
    run_model,
)

GOWALLA_ARGS = [
    "--data.input.path=%s" % os.path.join(REPO, "dataset"),
    "--data.input.dataset=gowalla",
    "--data.column.format=UI",
    "--data.convert.separator=','",
    "--splitter=ratio",
    "--ratio=0.8",
    "--by_time=False",
    "--topk=[10, 20]",
    '--metric=["Precision", "Recall", "NDCG", "MAP", "MRR"]',
    "--test_batch_size=2048",
]

# model -> (epochs, extra overrides); budgets sized for steady-state
# epochs at this scale (MF ~40 ms, MultiVAE ~0.2 s, WRMF ALS ~1 s)
MODELS = {
    "MF": (200, []),
    "MultiVAE": (100, []),
    "WRMF": (15, []),
    # the north-star configuration (shared constant => provably the same
    # experiment as gowalla_northstar.py; NOT the ml-100k shipped conf)
    "LightGCN": (250, LIGHTGCN_GOWALLA_ARGS),
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="run a single model in-process and merge")
    ap.add_argument("--only", help="driver mode, single model subprocess")
    a = ap.parse_args()
    ensure_local_copy()
    if a.one:
        epochs, extra = MODELS[a.one]
        merge_into(
            OUT, a.one,
            run_model(a.one, epochs, extra, extra_lib_args=GOWALLA_ARGS),
        )
        print("done", a.one)
    else:
        sys.exit(
            drive_models(
                os.path.abspath(__file__), OUT,
                [a.only] if a.only else list(MODELS),
                PER_MODEL_TIMEOUT_S,
            )
        )
