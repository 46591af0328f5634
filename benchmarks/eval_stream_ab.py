"""Streamed bits tier vs the resident table at gowalla scale.

The streamed tier exists for tables OVER the memory budget (packs each
scan batch's bits on device from edge pairs); this measures what the
fallback costs when it engages, under the production protocol
(distinct-params pool, np.asarray-forced, interleaved rounds, min).

Run: python benchmarks/eval_stream_ab.py [--rounds 5]
Writes benchmarks/eval_stream_ab.json.
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

from benchmarks.eval_bf16_ab import build  # gowalla MF evaluator builder
from benchmarks.gowalla_northstar import ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "eval_stream_ab.json")


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 5

    import jax

    ensure_local_copy()
    # table variant: compile fully under the default env first
    os.environ.pop("NEUREC_EVAL_BITS_BUDGET", None)
    m_t, p1, ev_t = build()
    r_table = ev_t.evaluate(m_t.predict, p1)
    prog_t = ev_t._get_steps(m_t.predict)
    assert prog_t.plan.table
    # streamed variant (fresh evaluator under the forced budget)
    os.environ["NEUREC_EVAL_BITS_BUDGET"] = "1"
    m_s, _, ev_s = build()
    r_stream = ev_s.evaluate(m_s.predict, p1)
    prog_s = ev_s._get_steps(m_s.predict)
    assert prog_s.plan.stream
    assert r_table == r_stream, "streamed tier is not bit-exact"

    bits = ev_t._get_bits_table(prog_t.plan.pack_block,
                                prog_t.plan.bits_width)
    ub_t, sb_t, vb_t = ev_t._default_batches
    ub_s, sb_s, vb_s = ev_s._default_batches
    edges = ev_s._default_edges(prog_s.plan)

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

    run(prog_t.full_all, (ub_t, sb_t, vb_t, bits), psets[:1])
    run(prog_s.full_all, (ub_s, sb_s, vb_s, edges), psets[:1])
    times = {"table": [], "streamed": []}
    for r in range(rounds):
        times["table"].append(
            round(run(prog_t.full_all, (ub_t, sb_t, vb_t, bits), psets), 4))
        times["streamed"].append(
            round(run(prog_s.full_all, (ub_s, sb_s, vb_s, edges), psets), 4))
        print("round %d done" % r, flush=True)

    n = len(ev_t.test_users)
    out = {"meta": {"users": n, "num_items": ev_t.num_items,
                    "bit_exact": True,
                    "protocol": "distinct-params pool, interleaved, min"},
           "variants": {}}
    for k, ts in times.items():
        out["variants"][k] = {
            "rounds_s_per_call": ts, "min_s": min(ts),
            "users_per_s_at_min": round(n / min(ts)),
        }
        print("%-9s min %.4fs/call (%d users/s)" % (k, min(ts), n / min(ts)))
    out["meta"]["stream_penalty"] = round(
        min(times["streamed"]) / min(times["table"]), 3)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("stream penalty: %.2fx" % out["meta"]["stream_penalty"])


if __name__ == "__main__":
    main()
