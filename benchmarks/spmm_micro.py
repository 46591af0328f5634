"""Microbenchmark: gowalla-scale SpMM — XLA segment-sum vs alternatives.

Isolates the LightGCN propagation hot op (ops/graph.py::spmm, the COO
path) at the north-star scale (68,404 nodes, ~382k normalized edges,
d=64) to find where the 31 ms train step goes and to baseline any Pallas
replacement. Run on the real TPU:  python benchmarks/spmm_micro.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np


def timeit(fn, *args, short=50, long=1050):
    """True steady-state ms/call via the delta method.

    On the tunneled TPU, naive loops lie in BOTH directions:
    ``block_until_ready`` can return without draining the remote queue
    (sub-0.1 ms readings for 100 MB kernels), and repeated identical
    (program, input) dispatches can be served from cache. The only
    measurement that held up is: chain each call's output into the next
    call's input (forces serial execution), run a short and a long chain,
    force FULL completion with one host materialization (np.asarray), and
    divide the wall-clock difference by the iteration difference — the
    constant transfer/overhead cancels. Cross-run variance on the shared
    chip is still ±50%; compare configs only within one process.
    """

    def run(iters):
        h = args[0]
        t0 = time.perf_counter()
        for _ in range(iters):
            h = fn(h, *args[1:])
        np.asarray(h)
        return time.perf_counter() - t0

    run(10)  # compile + warm
    t_short = run(short)
    t_long = run(long)
    return (t_long - t_short) / (long - short)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from neurec_tpu.ops.graph import build_norm_adjacency, spmm

    rng = np.random.default_rng(0)
    # gowalla-northstar shape: 29,858 users x 38,546 items, 173,794 train rows
    U, I, NNZ = 29858, 38546, 173794
    rows = rng.integers(0, U, NNZ)
    cols = rng.integers(0, I, NNZ)
    train = sp.csr_matrix(
        (np.ones(NNZ, np.float32), (rows, cols)), shape=(U, I)
    )
    adj = build_norm_adjacency(train, adj_type="pre")
    assert adj.dense is None, "COO path expected at this scale"
    n, d = adj.n_nodes, 64
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    print(f"n_nodes={n} nnz_pad={adj.rows.shape[0]} d={d}")

    # all measured fns are (n, d) -> (n, d) so timeit can chain them
    fwd = jax.jit(lambda h: spmm(adj, h) * 0.5 + x * 0.5)
    t = timeit(fwd, x)
    print(f"spmm fwd (default path): {t*1e3:8.3f} ms")

    cols_j, vals_j, rows_j = adj.cols, adj.vals, adj.rows
    seg = jax.jit(
        lambda h: jax.ops.segment_sum(
            h[cols_j] * vals_j[:, None], rows_j,
            num_segments=n, indices_are_sorted=True,
        ) * 0.5 + x * 0.5
    )
    t = timeit(seg, x)
    print(f"XLA gather+segment_sum : {t*1e3:8.3f} ms")

    # fwd+bwd through 3 stacked spmm layers (LightGCN shape)
    def loss3(x):
        h = x
        acc = x
        for _ in range(3):
            h = spmm(adj, h)
            acc = acc + h
        return jnp.sum(acc * acc)

    grad3 = jax.jit(lambda h: jax.grad(loss3)(h) * 1e-4 + x * 0.5)
    t = timeit(grad3, x)
    print(f"3-layer fwd+bwd        : {t*1e3:8.3f} ms")

    if "--sweep" in sys.argv:
        pallas_sweep(adj, x)


def pallas_sweep(adj, x):
    """Kernel-parameter sweep for the Pallas scatter: (tile_r, chunk) x
    dtype. FLOPs are 2*E*tile_r*d (chunk only trades padding vs grid
    overhead); bf16 halves the gather traffic and doubles the MXU rate."""
    import jax
    import jax.numpy as jnp

    from neurec_tpu.ops.pallas_spmm import build_spmm_plan, make_spmm

    rows = np.asarray(adj.rows)
    cols = np.asarray(adj.cols)
    vals = np.asarray(adj.vals)
    keep = vals != 0.0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    n = adj.n_nodes

    # f32 oracle for the bf16 precision report
    ref = np.asarray(jax.jit(lambda x: x[cols] * vals[:, None])(x))
    oracle = np.zeros((n, x.shape[1]), np.float32)
    np.add.at(oracle, rows, ref)
    scale = np.abs(oracle).mean() + 1e-12

    for tile_r, chunk in [(256, 256), (256, 512), (256, 1024), (512, 512)]:
        plan = build_spmm_plan(rows, cols, vals, n, tile_r, chunk)
        plan_t = build_spmm_plan(cols, rows, vals, n, tile_r, chunk)
        for dt_name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
            raw = make_spmm(plan, plan_t, compute_dtype=dt)
            f = jax.jit(lambda h, _r=raw: _r(h) * 0.5 + x * 0.5)
            t = timeit(f, x)
            out = np.asarray(raw(x))
            # note: 'f32' also rides the MXU default precision (bf16
            # multiply passes, f32 accumulate), so err vs the numpy
            # oracle is ~3e-2 of mean |out| for BOTH dtype labels
            err = np.abs(out - oracle).max() / scale
            print(
                f"pallas tile_r={tile_r:3d} chunk={chunk:4d} {dt_name:4s}"
                f" : {t*1e3:8.3f} ms  (rel err vs f32 oracle {err:.2e},"
                f" n_chunks={plan.rows.shape[0]})"
            )


if __name__ == "__main__":
    main()
