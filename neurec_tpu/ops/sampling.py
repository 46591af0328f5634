"""On-device negative sampling with per-user exclusion, jit-compatible.

Replaces the reference's host-side Cython/C++ rejection sampler
(util/cython/random_choice.pyx:20-89 ``randint_choice`` /
``batch_randint_choice``) — the training-path hot spot that NeuRec runs
single-threaded on the host every epoch (data/sampler.py:71-90). Here the
sampler runs inside the jitted train step on device, so an epoch never
leaves the chip.

Membership testing broadcasts candidates against the padded per-user
positive rows and reduces with ``any`` — a pure VPU elementwise pattern that
measures ~20x faster on TPU than a vmapped ``searchsorted`` binary search
(which lowers to serial gathers). Rows are padded with ``num_items``, which
can never equal a candidate in ``[0, num_items)``.

The rejection loop is bounded: ``num_rounds`` candidate draws per slot, take
the first non-positive. With density d (positives / num_items) the failure
probability is d**num_rounds — at the default 16 rounds and d = 0.5 that is
~1.5e-5, and real recommender rows are far sparser. On failure the last draw
is kept (may collide with a positive); exact-exclusion parity is asserted
statistically in tests/test_sampling.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_positive(
    rows: jnp.ndarray,        # (B, L) padded positive rows (pad = num_items)
    candidates: jnp.ndarray,  # (B, ...) candidate item ids
) -> jnp.ndarray:
    """Per-row membership: True where candidate is in the row's positives."""
    cand2d = candidates.reshape(candidates.shape[0], -1)       # (B, S)
    member = jnp.any(rows[:, None, :] == cand2d[:, :, None], axis=-1)
    return member.reshape(candidates.shape)


def sample_negatives(
    key: jax.Array,
    rows: jnp.ndarray,          # (B, L) per-slot exclusion rows
    num_items: int,
    shape: tuple,               # trailing shape per row, e.g. () or (neg_num,)
    num_rounds: int = 16,
) -> jnp.ndarray:
    """Draw uniform negatives in [0, num_items) excluding each row's positives.

    Returns int32 array of shape (B, *shape).

    Deliberately NOT wrapped in jax.jit: callers trace it inside their own
    jitted train steps, and a nested pjit boundary here blocks XLA from
    fusing the membership test with the surrounding embedding-gradient
    scatters (measured ~10x whole-step slowdown on TPU).
    """
    B = rows.shape[0]
    S = 1
    for d in shape:
        S *= d
    draws = jax.random.randint(
        key, (B, num_rounds * S), 0, num_items, dtype=jnp.int32
    )
    member = jnp.any(rows[:, None, :] == draws[:, :, None], axis=-1)
    # first ok round per slot; argmax returns 0 when no round succeeded,
    # which falls back to the round-0 draw (bounded-bias fallback).
    if S == 1:
        # keep everything 2-D: the 3-D take_along_axis form triggers an XLA
        # fusion pathology on TPU when combined with embedding-gradient
        # scatters in the surrounding train step (~10x step slowdown)
        first = jnp.argmax(~member, axis=1)                     # (B,)
        chosen = jnp.take_along_axis(draws, first[:, None], axis=1)[:, 0]
        return chosen.reshape((B,) + tuple(shape))
    ok = (~member).reshape(B, num_rounds, S)
    draws_r = draws.reshape(B, num_rounds, S)
    first = jnp.argmax(ok, axis=1)                              # (B, S)
    chosen = jnp.take_along_axis(draws_r, first[:, None, :], axis=1)[:, 0]
    return chosen.reshape((B,) + tuple(shape))


def sample_negatives_flat(
    key: jax.Array,
    user_ids: jnp.ndarray,       # (N,) users of each training instance
    padded_items: jnp.ndarray,   # (U, L) global padded positives
    num_items: int,
    shape: tuple = (),
    num_rounds: int = 16,
) -> jnp.ndarray:
    """Negative sampling for a flat batch of (user,) instances.

    Gathers each instance's exclusion row from the global padded table then
    delegates to ``sample_negatives``.
    """
    rows = padded_items[user_ids]                              # (N, L)
    return sample_negatives(key, rows, num_items, shape, num_rounds)
