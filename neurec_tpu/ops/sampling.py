"""On-device negative sampling with per-user exclusion, jit-compatible.

Replaces the reference's host-side Cython/C++ rejection sampler
(util/cython/random_choice.pyx:20-89 ``randint_choice`` /
``batch_randint_choice``) — the training-path hot spot that NeuRec runs
single-threaded on the host every epoch (data/sampler.py:71-90). Here the
sampler runs inside the jitted train step on device, so an epoch never
leaves the chip.

Membership testing uses the ascending-sorted padded per-user positive rows
(data/padded.py): a candidate ``c`` is a positive iff
``row[searchsorted(row, c)] == c``. Padding with ``num_items`` keeps the
rows sorted and can never equal a candidate in ``[0, num_items)``.

The rejection loop is bounded: ``num_rounds`` candidate draws per slot, take
the first non-positive. With density d (positives / num_items) the failure
probability is d**num_rounds — at the default 16 rounds and d = 0.5 that is
~1.5e-5, and real recommender rows are far sparser. On failure the last draw
is kept (may collide with a positive); exact-exclusion parity is asserted
statistically in tests/test_sampling.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def is_positive(
    sorted_rows: jnp.ndarray,   # (B, L) sorted padded rows (pad = num_items)
    candidates: jnp.ndarray,    # (B, ...) candidate item ids
) -> jnp.ndarray:
    """Per-row membership: True where candidate is in the row's positives."""
    cand2d = candidates.reshape(candidates.shape[0], -1)
    idx = jax.vmap(jnp.searchsorted)(sorted_rows, cand2d)      # (B, S)
    idx = jnp.minimum(idx, sorted_rows.shape[1] - 1)
    found = jnp.take_along_axis(sorted_rows, idx, axis=1) == cand2d
    return found.reshape(candidates.shape)


@partial(jax.jit, static_argnames=("num_items", "shape", "num_rounds"))
def sample_negatives(
    key: jax.Array,
    sorted_rows: jnp.ndarray,   # (B, L) per-slot exclusion rows
    num_items: int,
    shape: tuple,               # trailing shape per row, e.g. () or (neg_num,)
    num_rounds: int = 16,
) -> jnp.ndarray:
    """Draw uniform negatives in [0, num_items) excluding each row's positives.

    Returns int32 array of shape (B, *shape).
    """
    B = sorted_rows.shape[0]
    full_shape = (num_rounds, B) + tuple(shape)
    draws = jax.random.randint(key, full_shape, 0, num_items, dtype=jnp.int32)

    flat = draws.reshape(num_rounds, B, -1)                    # (R, B, S)
    # membership per round; vmap over the round axis
    member = jax.vmap(lambda d: is_positive(sorted_rows, d))(flat)  # (R,B,S)
    ok = ~member
    # first ok round per slot; argmax returns 0 when no round succeeded,
    # which falls back to the round-0 draw (bounded-bias fallback).
    first = jnp.argmax(ok, axis=0)                             # (B, S)
    chosen = jnp.take_along_axis(flat, first[None], axis=0)[0]  # (B, S)
    return chosen.reshape((B,) + tuple(shape))


def sample_negatives_flat(
    key: jax.Array,
    user_ids: jnp.ndarray,       # (N,) users of each training instance
    padded_items: jnp.ndarray,   # (U, L) global sorted padded positives
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
