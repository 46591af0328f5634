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


def timeit(fn, *args, warmup=8, iters=30):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    fwd = jax.jit(lambda x: spmm(adj, x))
    t = timeit(fwd, x)
    print(f"spmm fwd               : {t*1e3:8.3f} ms")

    gather = jax.jit(lambda x: x[adj.cols] * adj.vals[:, None])
    t = timeit(gather, x)
    print(f"  gather+scale only    : {t*1e3:8.3f} ms")

    g = gather(x)
    scatter = jax.jit(
        lambda g: jax.ops.segment_sum(
            g, adj.rows, num_segments=n, indices_are_sorted=True
        )
    )
    t = timeit(scatter, g)
    print(f"  segment_sum only     : {t*1e3:8.3f} ms")

    # fwd+bwd through 3 stacked spmm layers (LightGCN shape)
    def loss3(x):
        h = x
        acc = x
        for _ in range(3):
            h = spmm(adj, h)
            acc = acc + h
        return jnp.sum(acc * acc)

    grad3 = jax.jit(jax.grad(loss3))
    t = timeit(grad3, x)
    print(f"3-layer fwd+bwd        : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
