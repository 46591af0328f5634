"""Padded device-resident interaction structures.

The TPU design replaces the reference's per-user Python dicts
(util/tool.py:56-76) with static-shaped arrays usable inside jit:

``PaddedUserItems`` holds, for every user row:

* ``items``:   (num_users, max_len) int32, ascending-sorted item ids,
               padded with ``num_items`` (one past the last valid id) so
               ``searchsorted`` membership tests work unmodified;
* ``lengths``: (num_users,) int32 count of valid entries.

This single structure powers on-device negative-sampling exclusion
(ops/sampling.py), train-item masking at eval (eval/evaluator.py) and
dense-row reconstruction for the autoencoder family.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from scipy.sparse import csr_matrix


class PaddedUserItems(NamedTuple):
    items: np.ndarray    # (U, L) int32, sorted per row, padded with num_items
    lengths: np.ndarray  # (U,) int32
    num_items: int       # pad value == vocabulary size

    @property
    def max_len(self) -> int:
        return int(self.items.shape[1])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_padded_positives(
    matrix: csr_matrix,
    pad_multiple: int = 8,
    min_len: int = 8,
) -> PaddedUserItems:
    """CSR -> padded sorted per-user item rows.

    ``pad_multiple`` rounds the row length up so recompiles are rare when the
    same code runs on differently-sized datasets.
    """
    num_users, num_items = matrix.shape
    indptr, indices = matrix.indptr, matrix.indices
    lengths = np.diff(indptr).astype(np.int32)
    max_len = max(int(lengths.max()) if num_users else 0, min_len)
    max_len = _round_up(max_len, pad_multiple)

    items = np.full((num_users, max_len), num_items, dtype=np.int32)
    for u in range(num_users):
        lo, hi = indptr[u], indptr[u + 1]
        if hi > lo:
            items[u, : hi - lo] = np.sort(indices[lo:hi])
    return PaddedUserItems(items=items, lengths=lengths, num_items=num_items)


def build_padded_bytime(
    time_matrix: csr_matrix,
    train_matrix: csr_matrix,
    pad_multiple: int = 8,
    min_len: int = 8,
) -> PaddedUserItems:
    """Padded per-user item rows ordered by interaction timestamp.

    NOTE: rows are time-ordered, NOT sorted by id — do not use for
    searchsorted membership. Pairs with csr_to_user_dict_bytime semantics
    (util/tool.py:68-76).
    """
    num_users, num_items = time_matrix.shape
    indptr, indices, times = time_matrix.indptr, time_matrix.indices, time_matrix.data
    lengths = np.diff(indptr).astype(np.int32)
    max_len = max(int(lengths.max()) if num_users else 0, min_len)
    max_len = _round_up(max_len, pad_multiple)

    items = np.full((num_users, max_len), num_items, dtype=np.int32)
    for u in range(num_users):
        lo, hi = indptr[u], indptr[u + 1]
        if hi > lo:
            order = np.argsort(times[lo:hi], kind="stable")
            items[u, : hi - lo] = indices[lo:hi][order]
    return PaddedUserItems(items=items, lengths=lengths, num_items=num_items)
