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


def test_fewer_than_k_finite_values_stays_exact_and_k_gt_I_rejected():
    """ADVICE r4: rows with < k values above -inf were guarded only by a
    caller convention. In fact ascending-segment gathering keeps in-range
    columns ahead of pads at equal value, so with k <= I the result still
    equals lax.top_k exactly; k > I (the one genuinely unreachable case)
    is now rejected statically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from neurec_tpu.ops.fast_topk import exact_topk_indices

    I, k = 200, 16  # I not a multiple of seg=128 -> pad columns exist
    x = np.full((2, I), -np.inf, np.float32)
    x[0, :3] = [5.0, 4.0, 3.0]  # only 3 values above -inf, < k
    x[1, :50] = np.arange(50, dtype=np.float32)  # healthy row
    idx, overflow = exact_topk_indices(jnp.asarray(x), k)
    want = jax.lax.top_k(jnp.asarray(x), k)[1]
    if int(overflow) == 0:
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))
    assert np.asarray(idx).max() < I  # never a pad index at overflow 0

    with pytest.raises(ValueError, match="k <= row length"):
        exact_topk_indices(jnp.asarray(x[:, :8]), k)
