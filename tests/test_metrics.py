"""Differential tests: device metric kernels vs the per-user numpy oracle
(which mirrors the reference C++ metric.h loops line-for-line)."""

import jax.numpy as jnp
import numpy as np

from neurec_tpu.ops.metrics import METRIC_NAMES, all_metrics, hit_matrix
from neurec_tpu.ops.metrics_host import all_metrics_host


def _random_case(rng, num_items, K, max_truth):
    n_truth = rng.randint(1, max_truth + 1)
    truth = rng.choice(num_items, size=n_truth, replace=False)
    rank = rng.choice(num_items, size=K, replace=False)
    return rank, truth


def test_device_metrics_match_host_oracle():
    rng = np.random.RandomState(0)
    B, K, num_items, max_truth = 64, 20, 200, 30
    ranks, truths = [], []
    for _ in range(B):
        rank, truth = _random_case(rng, num_items, K, max_truth)
        ranks.append(rank)
        truths.append(truth)

    max_t = max(len(t) for t in truths)
    truth_pad = np.full((B, max_t), num_items, dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, t in enumerate(truths):
        truth_pad[i, : len(t)] = t
        lens[i] = len(t)

    hits = hit_matrix(
        jnp.asarray(np.stack(ranks).astype(np.int32)),
        jnp.asarray(truth_pad),
        jnp.asarray(lens),
    )
    got = np.asarray(all_metrics(hits, jnp.asarray(lens)))  # (B, 5, K)

    for i in range(B):
        want = all_metrics_host(ranks[i], set(truths[i].tolist()))
        # float32 cumsum on device vs float64 python loop: ~1e-4 relative
        np.testing.assert_allclose(
            got[i], want, rtol=2e-4, atol=1e-5,
            err_msg="user %d, metrics %s" % (i, METRIC_NAMES),
        )


def test_all_hits_and_no_hits():
    # rank == truth exactly
    K = 5
    rank = np.arange(K, dtype=np.int32)[None]
    truth = np.arange(K, dtype=np.int32)[None]
    lens = np.array([K], dtype=np.int32)
    hits = hit_matrix(jnp.asarray(rank), jnp.asarray(truth), jnp.asarray(lens))
    m = np.asarray(all_metrics(hits, jnp.asarray(lens)))[0]
    np.testing.assert_allclose(m[0], np.ones(K), rtol=1e-6)  # precision all 1
    np.testing.assert_allclose(m[1], (np.arange(K) + 1) / K, rtol=1e-6)  # recall
    np.testing.assert_allclose(m[3], np.ones(K), rtol=1e-6)  # ndcg all 1
    np.testing.assert_allclose(m[4], np.ones(K), rtol=1e-6)  # mrr

    # zero hits
    rank2 = (np.arange(K, dtype=np.int32) + 100)[None]
    hits2 = hit_matrix(jnp.asarray(rank2), jnp.asarray(truth), jnp.asarray(lens))
    m2 = np.asarray(all_metrics(hits2, jnp.asarray(lens)))[0]
    np.testing.assert_allclose(m2, np.zeros((5, K)), atol=1e-7)


def test_loo_case_recall_is_hitratio_map_equals_mrr():
    # leave-one-out: single truth item (uni_evaluator.py docstring semantics)
    rng = np.random.RandomState(1)
    K, num_items = 10, 50
    for _ in range(20):
        truth = rng.randint(0, num_items, size=1).astype(np.int32)
        rank = rng.choice(num_items, size=K, replace=False).astype(np.int32)
        lens = np.array([1], dtype=np.int32)
        hits = hit_matrix(
            jnp.asarray(rank[None]), jnp.asarray(truth[None]), jnp.asarray(lens)
        )
        m = np.asarray(all_metrics(hits, jnp.asarray(lens)))[0]
        np.testing.assert_allclose(m[2], m[4], rtol=1e-6)  # MAP == MRR
        assert set(np.unique(m[1])) <= {0.0, 1.0}  # recall == hit ratio


def test_empty_truth_rows_yield_finite_zeros():
    """A user with an empty truth set (possible through the public
    UniEvaluator dict API) must contribute finite zeros, not 0/0 = NaN
    that would poison the whole on-device metric accumulator; non-empty
    rows in the same batch are unaffected (review r5)."""
    K = 6
    num_items = 50
    rank = np.tile(np.arange(K, dtype=np.int32), (2, 1))
    truth = np.full((2, 3), num_items, dtype=np.int32)
    truth[1, :2] = [0, 3]
    lens = np.array([0, 2], dtype=np.int32)

    hits = hit_matrix(jnp.asarray(rank), jnp.asarray(truth), jnp.asarray(lens))
    m = np.asarray(all_metrics(hits, jnp.asarray(lens)))  # (2, 5, K)

    assert np.all(np.isfinite(m))
    np.testing.assert_array_equal(m[0], np.zeros((5, K)))
    want = all_metrics_host(rank[1], {0, 3})
    np.testing.assert_allclose(m[1], want, rtol=2e-4, atol=1e-5)
