"""Production eval A/B: XLA bit-plane-masked path vs legacy Pallas path.

Measurement lesson (round 4, the hard way): on the tunneled chip,
repeated identical (program, input) dispatches can be served from cache
and alternating two large programs can inflate both — so this driver
times each compiled eval program over a POOL OF DISTINCT param sets
(no (program, input) pair repeats), np.asarray-forced, interleaved
rounds, min over rounds.

Verdict recorded in benchmarks/eval_bits_prod_ab.json: the two paths are
numerically identical and EQUALLY fast at gowalla scale (isolated-scan
experiments that showed a 1.3x gap — eval_attrib3.json — did not
survive this protocol). The bits path stays the default for portability
(pure XLA: no Pallas requirement, GSPMD/shard_map-partitionable, no
per-call (B, I) int8 mask build); NEUREC_EVAL_PREMASK=0 restores the
legacy path.

Run:  python benchmarks/eval_bits_prod_ab.py [--rounds 6]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

from benchmarks.gowalla_northstar import ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "eval_bits_prod_ab.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def build(premask):
    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    if premask is None:
        os.environ.pop("NEUREC_EVAL_PREMASK", None)
    else:
        os.environ["NEUREC_EVAL_PREMASK"] = premask
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
    ds = Dataset(conf)
    m = get_model("MF")(ds, conf)
    tr = Trainer(m, ds, conf, logger=_SilentLogger())
    tr.initialize()
    return m, tr.params, tr.evaluator.evaluator


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 6

    import jax
    import jax.numpy as jnp

    ensure_local_copy()
    # the premask flag is read lazily at each evaluator's FIRST evaluate —
    # compile each path fully under its own env before switching (an
    # earlier revision of this script compared legacy vs legacy because
    # the second build's env clobbered the first's lazy read)
    m1, p1, ev_new = build(None)
    r_new = ev_new.evaluate(m1.predict, p1)
    assert ev_new._get_steps(m1.predict)[2], "bits path not engaged"
    m0, p0, ev_old = build("0")
    r_old = ev_old.evaluate(m0.predict, p1)
    assert not ev_old._get_steps(m0.predict)[2]
    assert r_new == r_old, (r_new, r_old)
    fa_new = ev_new._get_steps(m1.predict)[0]
    fa_old = ev_old._get_steps(m0.predict)[0]
    bits = ev_new._get_bits_table()
    dummy = jnp.zeros((1, 1), jnp.uint8)
    ub_n, sb_n, vb_n = ev_new._default_batches
    ub_o, sb_o, vb_o = ev_old._default_batches

    psets = [
        jax.tree_util.tree_map(lambda x: x * (1.0 + 1e-4 * (i + 1)), p1)
        for i in range(5)
    ]
    for ps in psets:
        jax.block_until_ready(ps)

    def run(fa, tail, ps_list):
        t0 = time.perf_counter()
        for ps in ps_list:
            np.asarray(fa(ps, *tail)[0])
        return (time.perf_counter() - t0) / len(ps_list)

    run(fa_old, (ub_o, sb_o, vb_o, dummy), psets[:1])
    run(fa_new, (ub_n, sb_n, vb_n, bits), psets[:1])
    times = {"legacy (pallas+scatter build)": [], "bits-fused default": []}
    for r in range(rounds):
        times["legacy (pallas+scatter build)"].append(
            round(run(fa_old, (ub_o, sb_o, vb_o, dummy), psets), 4)
        )
        times["bits-fused default"].append(
            round(run(fa_new, (ub_n, sb_n, vb_n, bits), psets), 4)
        )
        print("round %d done" % r, flush=True)

    n = len(ev_new.test_users)
    out = {"meta": {"users": n, "num_items": ev_new.num_items,
                    "protocol": "distinct-params pool, np.asarray-forced, "
                    "interleaved rounds, min"},
           "variants": {}}
    print()
    for k, ts in times.items():
        out["variants"][k] = {
            "rounds_s_per_call": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
            "users_per_s_at_min": round(n / min(ts)),
        }
        print("%-30s min %.4fs/call (%d users/s)" % (k, min(ts), n / min(ts)))

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
