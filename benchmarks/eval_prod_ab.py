"""Production eval throughput: cached vs per-call-rebuilt batch arrays.

Measures UniEvaluator.evaluate_raw end-to-end at gowalla scale with the
default-test-set batch cache (this round's change) against the old
behavior (forced by resetting the cache before each call), interleaved
in one process. Also reports eval users/s for BENCH.

Writes benchmarks/eval_prod_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from benchmarks.gowalla_northstar import ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "eval_prod_ab.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 6

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    ensure_local_copy()
    conf = Config(
        os.path.join(REPO, "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=[
            "--recommender=MF",
            "--data.input.path=%s" % os.path.join(REPO, "dataset"),
            "--data.input.dataset=gowalla",
            "--data.column.format=UI",
            "--data.convert.separator=','",
            "--splitter=ratio", "--ratio=0.8", "--by_time=False",
            "--epochs=0", "--embedding_size=64", "--topk=[20]",
            "--metric=[\"Recall\",\"NDCG\"]",
            "--test_batch_size=2048",
        ],
    )
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_SilentLogger())
    trainer.initialize()
    params = trainer.params
    ev = trainer.evaluator.evaluator
    n_users = len(ev.test_users)

    # compile + warm both paths
    for _ in range(3):
        ev.evaluate_raw(model.predict, params)

    def timed_call(reset):
        if reset:
            ev._default_batches = None
        t0 = time.perf_counter()
        ev.evaluate_raw(model.predict, params)
        return time.perf_counter() - t0

    times = {"cached": [], "rebuilt (old behavior)": []}
    for r in range(rounds):
        times["cached"].append(round(timed_call(False), 4))
        times["rebuilt (old behavior)"].append(round(timed_call(True), 4))
        print("round %d done" % r, flush=True)
    ev._default_batches = None
    ev.evaluate_raw(model.predict, params)  # restore cache state

    results = {"meta": {"users": n_users, "num_items": ev.num_items,
                        "batch": ev.batch_size, "K": int(ev.max_top)},
               "variants": {}}
    print()
    for name, ts in times.items():
        mn = min(ts)
        results["variants"][name] = {
            "rounds_s": ts, "min_s": mn,
            "median_s": sorted(ts)[len(ts) // 2],
            "users_per_s_at_min": round(n_users / mn),
        }
        print("%-24s min %.4fs  median %.4fs  (%d users/s)"
              % (name, mn, sorted(ts)[len(ts) // 2], n_users / mn))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
