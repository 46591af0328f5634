"""Epoch-level interleaved A/B of SpMM kernel configs on the real north star.

Microbenchmark deltas on the shared tunneled chip are noise-bound (see
ab_spmm_pack.json — negative mins under contention); whole-epoch jitted
scans from the Trainer are the reliable timing (CLAUDE.md measurement
doctrine). This driver builds one LightGCN/gowalla trainer per SpMM
config, compiles all, then interleaves epochs round-robin and reports
min/median epoch seconds per config.

Writes benchmarks/ab_spmm_epoch.json.

Run:  python benchmarks/ab_spmm_epoch.py [--epochs-per-config 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from benchmarks.gowalla_northstar import LIGHTGCN_GOWALLA_ARGS, ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "ab_spmm_epoch.json")

CONFIGS = {
    "chunk256": {"NEUREC_SPMM_CHUNK": "256"},
    "chunk512": {"NEUREC_SPMM_CHUNK": "512"},
    "chunk512_pack2": {"NEUREC_SPMM_CHUNK": "512", "NEUREC_SPMM_PACK": "2"},
}


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def build_trainer(conf_args):
    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    conf = Config(
        os.path.join(REPO, "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=conf_args,
    )
    dataset = Dataset(conf)
    model = get_model("LightGCN")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_SilentLogger())
    trainer.initialize()
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-config", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    ensure_local_copy()
    conf_args = [
        "--recommender=LightGCN",
        "--data.input.path=%s" % os.path.join(REPO, "dataset"),
        "--data.input.dataset=gowalla",
        "--data.column.format=UI",
        "--data.convert.separator=','",
        "--splitter=ratio", "--ratio=0.8", "--by_time=False",
        "--epochs=1", "--topk=[20]", "--metric=[\"Recall\",\"NDCG\"]",
        "--test_batch_size=2048",
    ] + LIGHTGCN_GOWALLA_ARGS

    saved = {k: os.environ.get(k) for c in CONFIGS.values() for k in c}
    trainers = {}
    compile_s = {}
    key = jax.random.PRNGKey(2018)
    try:
        for name, env in CONFIGS.items():
            for k in saved:
                os.environ.pop(k, None)
            os.environ.update(env)
            t0 = time.perf_counter()
            tr = build_trainer(conf_args)
            # first epoch = compile
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, 0),
                jnp.int32(1),
            )
            jax.block_until_ready(tr.params)
            compile_s[name] = round(time.perf_counter() - t0, 1)
            trainers[name] = tr
            print("built+compiled %s in %.0fs" % (name, compile_s[name]),
                  flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    # warm each a little (post-compile ramp, CLAUDE.md)
    for tr in trainers.values():
        for e in range(2):
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, e + 1),
                jnp.int32(1),
            )
        jax.block_until_ready(tr.params)

    times = {name: [] for name in trainers}
    for e in range(args.epochs_per_config):
        for name, tr in trainers.items():
            t0 = time.perf_counter()
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, 100 + e),
                jnp.int32(2 + e),
            )
            jax.block_until_ready(tr.params)
            times[name].append(round(time.perf_counter() - t0, 4))
        print("epoch round %d done" % e, flush=True)

    results = {
        "protocol": "interleaved whole-epoch timings, %d rounds, "
        "one process; min is the contention-free estimate"
        % args.epochs_per_config,
        "configs": {},
    }
    for name, ts in times.items():
        results["configs"][name] = {
            "env": CONFIGS[name],
            "compile_s": compile_s[name],
            "epochs_s": ts,
            "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
        }
        print("%-18s min %.3fs  median %.3fs" % (
            name, min(ts), sorted(ts)[len(ts) // 2]), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
