"""Within-process interleaved A/B: Pallas SpMM variants at north-star scale.

Measurement doctrine (CLAUDE.md): the shared tunneled chip's load swings
at the seconds scale, so even sequential within-process measurements of
two variants can be skewed 2-10x by contention. This harness therefore
compiles all variants first, then runs R interleaved rounds of the
delta-method chain per variant and reports the MIN across rounds — the
min is the contention-free estimate; a spike inflates one round, never
deflates one.

Writes benchmarks/ab_spmm_pack.json (VERDICT r3 #9 — auditable evidence
for the tuned kernel constants).

Run:  python benchmarks/spmm_pack_ab.py [--rounds N] [--iters N]
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

OUT = os.path.join(REPO, "benchmarks", "ab_spmm_pack.json")


def chain_ms(fn, x0, iters):
    """One delta-method chain: (time(iters) - time(base)) / delta."""
    base = max(iters // 10, 2)

    def run(k):
        h = x0
        t0 = time.perf_counter()
        for _ in range(k):
            h = fn(h)
        np.asarray(h)
        return time.perf_counter() - t0

    t_short = run(base)
    t_long = run(iters)
    return (t_long - t_short) / (iters - base) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from neurec_tpu.ops.graph import build_norm_adjacency
    from neurec_tpu.ops.pallas_spmm import (
        build_spmm_plan,
        plan_scatter,
        plan_spmm_packed,
    )

    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 5
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 120

    rng = np.random.default_rng(0)
    U, I, NNZ = 29858, 38546, 173794  # gowalla-northstar shape
    rows = rng.integers(0, U, NNZ)
    cols = rng.integers(0, I, NNZ)
    train = sp.csr_matrix(
        (np.ones(NNZ, np.float32), (rows, cols)), shape=(U, I)
    )
    adj = build_norm_adjacency(train, adj_type="pre")
    n, d = adj.n_nodes, 64
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    er = np.asarray(adj.rows)
    ec = np.asarray(adj.cols)
    ev = np.asarray(adj.vals)
    keep = ev != 0.0
    er, ec, ev = er[keep], ec[keep], ev[keep]

    oracle = np.zeros((n, d), np.float32)
    np.add.at(oracle, er, ev[:, None] * np.asarray(x)[ec])
    scale = np.abs(oracle).mean() + 1e-12

    bf16 = jnp.bfloat16
    variants = {}  # label -> (jitted chainable fn, raw fn or None)

    def add(label, fn, check=False):
        variants[label] = (
            jax.jit(lambda h, _f=fn: _f(h) * 0.5 + x * 0.5),
            fn if check else None,
        )

    for tile_r, chunk in [(256, 256), (256, 512), (256, 1024)]:
        plan = build_spmm_plan(er, ec, ev, n, tile_r=tile_r, chunk=chunk)

        def plain(h, _p=plan):
            g = h.astype(bf16)[_p.cols.reshape(-1)]
            return plan_scatter(_p, g)

        def packed(h, _p=plan):
            return plan_spmm_packed(_p, h.astype(bf16), pack=2)

        add("plain  tile=%d chunk=%d" % (tile_r, chunk), plain, check=True)
        add("packed tile=%d chunk=%d" % (tile_r, chunk), packed, check=True)

    # attribution probes
    cols_flat = np.sort(ec)
    add(
        "probe: gather+reduce sorted cols",
        lambda h: jnp.zeros((n, d)).at[0].add(
            h.astype(bf16)[cols_flat].astype(jnp.float32).sum(0)
        ),
    )
    plan256 = build_spmm_plan(er, ec, ev, n, tile_r=256, chunk=256)
    cols_rand = plan256.cols.reshape(-1)
    add(
        "probe: gather+reduce plan cols",
        lambda h: jnp.zeros((n, d)).at[0].add(
            h.astype(bf16)[cols_rand].astype(jnp.float32).sum(0)
        ),
    )
    seq_cols = (
        np.arange(plan256.cols.size, dtype=np.int32).reshape(plan256.cols.shape)
        % n
    )
    plan_seq = plan256._replace(cols=seq_cols)
    add(
        "probe: plain kernel, seq cols",
        lambda h: plan_scatter(plan_seq, h.astype(bf16)[seq_cols.reshape(-1)]),
    )

    # compile + correctness pass
    results = {"scale": {"n_nodes": n, "edges": int(keep.sum()), "d": d},
               "protocol": "interleaved rounds=%d iters=%d, min over rounds"
               % (rounds, iters),
               "variants": {}}
    for label, (jf, raw) in variants.items():
        jf(x).block_until_ready()
        row = {"rounds_ms": []}
        if raw is not None:
            out = np.asarray(raw(x))
            row["rel_err_vs_f32_oracle"] = float(np.abs(out - oracle).max() / scale)
        results["variants"][label] = row

    for r in range(rounds):
        for label, (jf, _) in variants.items():
            ms = chain_ms(jf, x, iters)
            results["variants"][label]["rounds_ms"].append(round(ms, 4))
        print("round %d done" % r, flush=True)

    print()
    for label, row in results["variants"].items():
        row["min_ms"] = min(row["rounds_ms"])
        row["median_ms"] = sorted(row["rounds_ms"])[len(row["rounds_ms"]) // 2]
        err = row.get("rel_err_vs_f32_oracle")
        print("%-36s min %7.3f ms  median %7.3f ms%s"
              % (label, row["min_ms"], row["median_ms"],
                 ("  err %.1e" % err) if err is not None else ""))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
