"""Epoch-level interleaved A/B: scan unroll factor for the MF fused epoch.

VERDICT r3 weak #4: the MF step at batch 512 runs ~85 us — ~10x its HBM
traffic floor — because the XLA while-loop's fixed per-iteration cost
dominates tiny-table work. ``lax.scan(unroll=k)`` amortizes that cost
over k logical steps. Protocol: whole-epoch timings, interleaved rounds,
min over rounds (the only protocol that produced stable results on the
shared chip — see ab_spmm_epoch.py).

Writes benchmarks/ab_mf_unroll.json.

Run:  python benchmarks/ab_mf_unroll.py [--rounds 8] [--epochs-per-round 20]
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

OUT = os.path.join(REPO, "benchmarks", "ab_mf_unroll.json")

UNROLLS = [1, 4, 8, 16]


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--epochs-per-round", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    trainers = {}
    key = jax.random.PRNGKey(2018)
    dataset = None
    for u in UNROLLS:
        conf = Config(
            os.path.join(REPO, "NeuRec.properties"),
            default_section="hyperparameters",
            cmd_args=[
                "--recommender=MF", "--epochs=1",
                "--batch_size=%d" % args.batch_size,
                "--scan_unroll=%d" % u,
                "--topk=[20]", "--metric=[\"Recall\",\"NDCG\"]",
            ],
        )
        if dataset is None:
            dataset = Dataset(conf)
        model = get_model("MF")(dataset, conf)
        tr = Trainer(model, dataset, conf, logger=_SilentLogger())
        tr.initialize()
        t0 = time.perf_counter()
        tr.params, tr.opt_state, _ = tr._epoch_fn(
            tr.params, tr.opt_state, jax.random.fold_in(key, 0), jnp.int32(1)
        )
        jax.block_until_ready(tr.params)
        print("unroll=%d compiled in %.0fs" % (u, time.perf_counter() - t0),
              flush=True)
        trainers[u] = tr

    def run_epochs(tr, n, seed):
        t0 = time.perf_counter()
        for e in range(n):
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, seed + e),
                jnp.int32(2 + e),
            )
        jax.block_until_ready(tr.params)
        return time.perf_counter() - t0

    for tr in trainers.values():  # post-compile warm ramp
        run_epochs(tr, 3, 1)

    times = {u: [] for u in UNROLLS}
    for r in range(args.rounds):
        for u, tr in trainers.items():
            dt = run_epochs(tr, args.epochs_per_round, 100 + r * 50)
            times[u].append(round(dt / args.epochs_per_round, 5))
        print("round %d done" % r, flush=True)

    steps = -(-dataset.train_matrix.nnz // args.batch_size)
    results = {
        "protocol": "interleaved, %d epochs per timing, min over %d rounds"
        % (args.epochs_per_round, args.rounds),
        "batch_size": args.batch_size, "steps_per_epoch": steps,
        "configs": {},
    }
    print()
    for u, ts in times.items():
        results["configs"]["unroll%d" % u] = {
            "epochs_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
            "us_per_step_min": round(min(ts) / steps * 1e6, 2),
        }
        print("unroll=%-3d min %.4fs/epoch  (%.1f us/step)  median %.4fs"
              % (u, min(ts), min(ts) / steps * 1e6,
                 sorted(ts)[len(ts) // 2]), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
