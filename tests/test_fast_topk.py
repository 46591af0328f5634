"""exact_topk_indices vs lax.top_k oracle — exactness incl. ties/overflow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurec_tpu.ops.fast_topk import exact_topk_indices


def _check(x, k, **kw):
    idx, ovf = jax.jit(
        lambda x: exact_topk_indices(x, k, **kw)
    )(jnp.asarray(x))
    want = jax.lax.top_k(jnp.asarray(x), k)[1]
    return np.asarray(idx), np.asarray(want), int(ovf)


def test_random_matches_topk():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 5000)).astype(np.float32)
    idx, want, ovf = _check(x, 20)
    assert ovf == 0
    np.testing.assert_array_equal(idx, want)


def test_ties_at_boundary_match_topk():
    """Many duplicated values straddling the K boundary: tie-breaking
    (lowest index first) must match lax.top_k exactly."""
    rng = np.random.default_rng(1)
    x = rng.integers(0, 30, (32, 4000)).astype(np.float32)  # heavy ties
    idx, want, ovf = _check(x, 20)
    assert ovf == 0
    np.testing.assert_array_equal(idx, want)


def test_masked_rows_with_neg_inf():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 3000)).astype(np.float32)
    mask = rng.random((16, 3000)) < 0.3
    x[mask] = -np.inf
    idx, want, ovf = _check(x, 10)
    assert ovf == 0
    np.testing.assert_array_equal(idx, want)


def test_overflow_detected_not_silent():
    """With max_hot too small to cover the candidates, overflow must be
    reported (the result may then differ — callers fall back)."""
    rng = np.random.default_rng(3)
    # top values spread over many segments: every segment is hot
    x = rng.standard_normal((8, 4096)).astype(np.float32)
    idx, want, ovf = _check(x, 20, seg=128, max_hot=2)
    assert ovf > 0


def test_non_segment_multiple_length():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((16, 1203)).astype(np.float32)
    idx, want, ovf = _check(x, 20)
    assert ovf == 0
    np.testing.assert_array_equal(idx, want)
