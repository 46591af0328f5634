"""GRU4Rec compile-churn fix validation (VERDICT r4 next #8).

r4's sweep wall times for the session-RNN family were compile-dominated
(GRU4Rec 812 s vs 36-88 s equal-work peers, benchmarks/RESULTS.md):
`_sched_len` grew on demand, so a permutation producing a longer
session-parallel schedule re-jitted the whole epoch (20-300 s remote
compile) mid-run. r5 pins the static length up front to the greedy
list-scheduling makespan bound (gru4rec.py::_pin_sched_len).

This driver trains GRU4Rec on ml-100k for N epochs and records:
* the number of distinct compiled schedule lengths (must be 1);
* per-epoch wall times (epoch 1 pays the single compile; the rest are
  execution-only);
* the projected 30-epoch training wall time vs r4's measured 812 s.

Run: python benchmarks/gru4rec_churn.py [--epochs 6]
Writes benchmarks/gru4rec_churn.json.
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

import jax
import jax.numpy as jnp
import numpy as np


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "gru4rec_churn.json"))
    args = ap.parse_args()

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    conf = Config(
        os.path.join(REPO, "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=["--recommender=GRU4Rec", "--epochs=%d" % args.epochs],
    )
    ds = Dataset(conf)
    model = get_model("GRU4Rec")(ds, conf)
    tr = Trainer(model, ds, conf, logger=_SilentLogger())
    tr.initialize()

    sched_lens = set()
    epoch_s = []
    key = jax.random.PRNGKey(0)
    for e in range(args.epochs):
        t0 = time.perf_counter()
        tr.params, tr.opt_state, loss = tr._epoch_fn(
            tr.params, tr.opt_state, jax.random.fold_in(key, e),
            jnp.int32(e + 1),
        )
        jax.block_until_ready(tr.params)
        epoch_s.append(round(time.perf_counter() - t0, 3))
        sched_lens.add(model._sched_len)
        print("epoch %d: %.2fs (sched_len=%d, loss=%.4f)"
              % (e, epoch_s[-1], model._sched_len, float(loss)), flush=True)

    steady = float(np.median(epoch_s[1:])) if len(epoch_s) > 1 else epoch_s[0]
    out = {
        "epochs": args.epochs,
        "epoch_s": epoch_s,
        "distinct_sched_lens": sorted(int(x) for x in sched_lens),
        "compile_epochs": sum(
            1 for t in epoch_s if t > 3 * steady
        ),
        "steady_epoch_s": round(steady, 3),
        "projected_30_epoch_s": round(epoch_s[0] + 29 * steady, 1),
        "r4_sweep_wall_s": 812,
    }
    assert len(sched_lens) == 1, "schedule length still grows: %s" % sched_lens
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
