"""Exact top-K indices at approx_max_k speed (the eval ranking hot op).

``jax.lax.top_k`` on TPU costs ~N*K work (measured: K=64 is ~3x K=20 at
the same N — benchmarks/eval_topk_ab.json), which makes it a third of
full-catalog eval time at gowalla scale. This module computes the SAME
result (same ids, same tie-breaking) in ~N + small work:

1. ``approx_max_k(x, K)`` (TPU PartialReduce — one cheap pass) gives K
   approximate top values. Their K-th largest ``t0`` is a GUARANTEED
   lower bound of the true K-th value t (the candidate set is a subset
   of the row, so its K-th largest can only be <= t).
2. One fused pass marks the length-``seg`` segments containing any value
   >= t0. Every true top-K element is >= t >= t0, so it lives in a hot
   segment. The first ``max_hot`` hot segment ids (ascending) are picked
   with a tiny top_k over negated ids.
3. The hot segments are gathered (B, max_hot, seg) and exactly re-ranked
   with a small ``lax.top_k``; local winners map back to global ids.

Exactness: if a row has more than ``max_hot`` hot segments the gather
may drop a candidate — the per-row condition is detected EXACTLY and
returned as an ``overflow`` count; callers fall back to the plain
``lax.top_k`` program for that call (evaluator does this
transparently). Tie-breaking matches ``lax.top_k`` (lowest index wins):
hot segments are gathered in ascending id order, so flat positions of
any values >= t0 are in global index order, and values < t0 (cold
filler) can never tie at the K-boundary (boundary value t >= t0; cold
segments are strictly < t0).

No reference counterpart — the reference ranks on host CPU threads
(evaluate.h:23-50); this replaces the device-side ranking the TPU
rebuild introduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_BIG = jnp.float32(-3.0e38)


def exact_topk_indices(
    x: jnp.ndarray,  # (B, I) float32 scores (may contain -inf)
    k: int,
    seg: int = 128,
    max_hot: int = 64,
    recall_target: float = 0.99,
):
    """(indices (B, k) int32, overflow scalar int32).

    ``indices`` equals ``jax.lax.top_k(x, k)[1]`` exactly whenever
    ``overflow == 0``. Plain traceable function — callers jit it.
    """
    B, I = x.shape
    if k > I:
        # pad columns (-inf) would be selected with indices >= I where
        # lax.top_k has no row at all — reject statically instead of
        # leaving it as a caller convention (ADVICE r4)
        raise ValueError("exact_topk_indices needs k <= row length, got "
                         "k=%d > I=%d" % (k, I))
    i_pad = (-I) % seg
    if i_pad:
        x = jnp.pad(x, ((0, 0), (0, i_pad)), constant_values=-jnp.inf)
    Ip = I + i_pad
    n_seg = Ip // seg

    av, _ = jax.lax.approx_max_k(x, k, recall_target=recall_target)
    t0 = jax.lax.top_k(av, k)[0][:, k - 1]            # (B,) lower bound of t

    x3 = x.reshape(B, n_seg, seg)
    hot = jnp.any(x3 >= t0[:, None, None], axis=2)    # (B, n_seg)
    overflow = jnp.sum(
        (jnp.sum(hot, axis=1) > max_hot).astype(jnp.int32)
    )

    # first max_hot hot segment ids, ascending: top_k over -id for hot
    # segments (distinct values — deterministic), cold filler sorts after
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (B, n_seg), 1)
    key = jnp.where(hot, -seg_iota.astype(jnp.float32), _NEG_BIG)
    _, seg_pick = jax.lax.top_k(key, min(max_hot, n_seg))  # (B, H) asc ids
    H = seg_pick.shape[1]

    gathered = jnp.take_along_axis(x3, seg_pick[:, :, None], axis=1)
    flat = gathered.reshape(B, H * seg)
    _, loc = jax.lax.top_k(flat, k)                   # (B, k) flat positions
    owner = jnp.take_along_axis(seg_pick, loc // seg, axis=1)
    idx = owner * seg + loc % seg
    # pad columns carry -inf; because hot segments are gathered in
    # ascending id order, in-range entries always precede pads at equal
    # value, so with k <= I (enforced above) a pad index is unreachable.
    # Fold idx >= I into the overflow signal anyway — one (B, k) compare
    # buys a runtime guarantee instead of a proof obligation (ADVICE r4);
    # callers already fall back to plain lax.top_k when overflow != 0.
    overflow = overflow + jnp.sum(
        jnp.any(idx >= I, axis=1).astype(jnp.int32)
    )
    return idx.astype(jnp.int32), overflow
