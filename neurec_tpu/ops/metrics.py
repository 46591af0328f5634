"""On-device ranking metrics, vectorized over (batch, rank).

Replaces the reference's per-user C++ metric kernels
(evaluator/backend/cpp/include/metric.h:17-109) with cumulative-sum forms
computed for a whole batch of users at once on the TPU VPU. Semantics are
bit-matched against the C++ loops (see ops/metrics_host.py for the numpy
oracle and tests/test_metrics.py for the differential tests):

given the top-K ranked item ids of a user and their ground-truth set,
each metric produces a length-K vector whose r-th entry is the metric
evaluated on the rank-(r+1) prefix:

* Precision@r = hits_r / r
* Recall@r    = hits_r / |truth|
* MAP@r (``ap``) = (sum of precision at hit positions <= r) / min(r, |truth|)
  — the reference's denominator quirk, metric.h:62
* NDCG@r      = DCG_r / iDCG_r with iDCG accumulating 1/log2(i+2) only for
  the first |truth| ranks (metric.h:69-86)
* MRR@r       = 1/rank of first hit, 0 before the first hit (metric.h:89-109)
"""

from __future__ import annotations

import jax.numpy as jnp

METRIC_NAMES = ("Precision", "Recall", "MAP", "NDCG", "MRR")
METRIC_INDEX = {name: i for i, name in enumerate(METRIC_NAMES)}


def hit_matrix(
    topk_items: jnp.ndarray,   # (B, K) int32 ranked item ids
    truth_items: jnp.ndarray,  # (B, T) int32 padded ground-truth ids
    truth_lengths: jnp.ndarray,  # (B,) int32 number of valid truth entries
) -> jnp.ndarray:
    """(B, K) float32 — 1 where the ranked item is in the user's truth set."""
    valid = (
        jnp.arange(truth_items.shape[1], dtype=jnp.int32)[None, :]
        < truth_lengths[:, None]
    )
    eq = topk_items[:, :, None] == truth_items[:, None, :]
    return jnp.any(eq & valid[:, None, :], axis=-1).astype(jnp.float32)


def all_metrics(
    hits: jnp.ndarray,          # (B, K) float32 from hit_matrix
    truth_lengths: jnp.ndarray,  # (B,) int32
) -> jnp.ndarray:
    """Compute all five metric vectors; returns (B, 5, K) float32.

    Order matches METRIC_NAMES = (Precision, Recall, MAP, NDCG, MRR).
    """
    B, K = hits.shape
    ranks = jnp.arange(1, K + 1, dtype=jnp.float32)[None, :]     # (1, K)
    truth_len = truth_lengths.astype(jnp.float32)[:, None]        # (B, 1)
    cum_hits = jnp.cumsum(hits, axis=1)                           # (B, K)

    # truth_len == 0 (an empty truth row fed through the public
    # UniEvaluator API) would make recall/ndcg 0/0 = NaN and poison the
    # whole metric accumulator; with zero truth entries hits are all 0,
    # so a clamped denominator yields the correct 0 rows instead and is
    # a no-op for every non-empty user.
    safe_truth = jnp.maximum(truth_len, 1.0)

    precision = cum_hits / ranks
    recall = cum_hits / safe_truth

    # MAP: sum of precision at hit positions, / min(rank, |truth|)
    sum_pre = jnp.cumsum(hits * precision, axis=1)
    ap = jnp.where(cum_hits > 0, sum_pre / jnp.minimum(ranks, safe_truth), 0.0)

    # NDCG
    gains = 1.0 / jnp.log2(ranks + 1.0)                           # (1, K)
    dcg = jnp.cumsum(hits * gains, axis=1)
    ideal_mask = (ranks <= truth_len).astype(jnp.float32)         # (B, K)
    idcg = jnp.cumsum(ideal_mask * gains, axis=1)
    ndcg = dcg / jnp.maximum(idcg, 1e-12)  # idcg >= 1.0 whenever |truth| >= 1

    # MRR: 1/(first hit rank); 0 before the first hit
    has_hit = cum_hits > 0
    first_hit = jnp.argmax(hits > 0, axis=1).astype(jnp.float32)  # (B,)
    mrr = jnp.where(has_hit, 1.0 / (first_hit[:, None] + 1.0), 0.0)

    return jnp.stack([precision, recall, ap, ndcg, mrr], axis=1)
