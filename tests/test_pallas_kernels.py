"""Pallas masked-scores kernel vs the XLA reference formulation.

Runs in interpreter mode on the CPU test platform; the compiled path is
exercised on real TPU by the benchmark/evaluator.
"""

import jax.numpy as jnp
import numpy as np

from neurec_tpu.ops.pallas_kernels import masked_scores


def _reference(u, items, rows, num_items):
    scores = np.asarray(u @ items.T, dtype=np.float32)
    for b in range(rows.shape[0]):
        for it in rows[b]:
            if it < num_items:
                scores[b, it] = -np.inf
    return scores


def test_masked_scores_interpret():
    rng = np.random.RandomState(0)
    B, I, d, L = 16, 700, 32, 40
    u = rng.randn(B, d).astype(np.float32)
    items = rng.randn(I, d).astype(np.float32)
    rows = np.full((B, L), I, dtype=np.int32)
    for b in range(B):
        n = rng.randint(1, L)
        rows[b, :n] = np.sort(rng.choice(I, size=n, replace=False))

    got = np.asarray(
        masked_scores(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(rows),
            block_items=256, interpret=True,
        )
    )
    want = _reference(u, items, rows, I)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_masked_scores_no_mask():
    rng = np.random.RandomState(1)
    B, I, d = 8, 300, 16
    u = rng.randn(B, d).astype(np.float32)
    items = rng.randn(I, d).astype(np.float32)
    rows = np.full((B, 4), I, dtype=np.int32)  # all padding: no masking
    got = np.asarray(
        masked_scores(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(rows),
            block_items=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, u @ items.T, rtol=1e-5, atol=1e-5)
