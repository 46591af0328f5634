"""MF sampled-epoch A/B: broadcast-compare exclusion vs pair Bloom filter.

mf_step_attrib.json puts on-device negative sampling at ~20 us of MF's
62 us step — and the broadcast membership test compares every candidate
against the user's FULL padded row (ml-100k: L_max ~ 600), while the
Bloom filter (ops/bloom.py, built for the heavy-tail budget) does 5
byte gathers per candidate regardless of row length. If Bloom wins at
epoch level here, it should become the default below the budget too.

Protocol (CLAUDE.md doctrine): whole-epoch Trainer timings, variants
INTERLEAVED, min over rounds (microbench deltas are unreliable on the
tunneled chip).

Run: python benchmarks/ab_mf_bloom.py [--rounds 5]
Writes benchmarks/ab_mf_bloom.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(REPO, "benchmarks", "ab_mf_bloom.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def build(force_bloom):
    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    saved = trainer_mod._EXCL_TABLE_BUDGET
    if force_bloom:
        trainer_mod._EXCL_TABLE_BUDGET = 0
    try:
        conf = Config(
            os.path.join(REPO, "NeuRec.properties"),
            default_section="hyperparameters",
            cmd_args=["--recommender=MF", "--epochs=0"],
        )
        ds = Dataset(conf)
        m = get_model("MF")(ds, conf)
        tr = Trainer(m, ds, conf, logger=_SilentLogger())
        assert (tr._excl_bloom is not None) == force_bloom
        tr.initialize()
        return tr, ds
    finally:
        trainer_mod._EXCL_TABLE_BUDGET = saved


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 5

    variants = {}
    for tag, force in (("rows_broadcast", False), ("bloom", True)):
        tr, ds = build(force)
        key = jax.random.PRNGKey(0)
        # compile + steady-state warmup (first ~1 s post-compile is slow)
        for w in range(8):
            p, o, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, 100 + w),
                jnp.int32(1),
            )
            jax.block_until_ready(p)
            tr.params, tr.opt_state = p, o
        variants[tag] = tr
        nnz = ds.train_matrix.nnz

    def run_epochs(tr, seed, n=5):
        key = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        for e in range(n):
            tr.params, tr.opt_state, loss = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, e),
                jnp.int32(e + 1),
            )
        jax.block_until_ready(tr.params)
        return (time.perf_counter() - t0) / n

    times = {k: [] for k in variants}
    for r in range(rounds):
        for k, tr in variants.items():
            times[k].append(round(run_epochs(tr, 1000 + r), 5))
        print("round %d done" % r, flush=True)

    out = {"meta": {"nnz_per_epoch": int(nnz),
                    "protocol": "whole-epoch, interleaved, min-over-rounds"},
           "variants": {}}
    for k, ts in times.items():
        out["variants"][k] = {
            "rounds_s_per_epoch": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
            "examples_per_s_at_min": round(nnz / min(ts)),
        }
        print("%-15s min %.5fs/epoch (%.2fM ex/s)"
              % (k, min(ts), nnz / min(ts) / 1e6))
    speed = min(times["rows_broadcast"]) / min(times["bloom"])
    out["meta"]["bloom_speedup"] = round(speed, 3)
    out["meta"]["verdict"] = (
        "ADOPT bloom below budget too" if speed >= 1.1
        else "keep broadcast-compare default (%.2fx)" % speed
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(out["meta"]["verdict"])


if __name__ == "__main__":
    main()
