"""Shared state for time-order sequential models (FPMC/HRM/NPE/TransRec/...).

At eval time these models condition every score on the user's most recent
``high_order`` training items (e.g. FPMC.py:139-146 predict). The reference
re-feeds those per user per item batch from the host; here they live on
device as a (num_users, high_order) array built once from the by-time train
dict.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class SequentialMixin:
    high_order: int = 1

    def _setup_recent(self, dataset):
        """Last ``high_order`` train items per user, time-ordered (oldest
        first within the window), padded with 0 for cold users."""
        train_dict = dataset.get_user_train_dict(by_time=True)
        recent = np.zeros((self.num_users, self.high_order), dtype=np.int32)
        has = np.zeros(self.num_users, dtype=bool)
        for u, seq in train_dict.items():
            tail = seq[-self.high_order :]
            if not tail:
                continue
            # left-pad with the earliest item of the tail for short histories
            row = [tail[0]] * (self.high_order - len(tail)) + list(tail)
            recent[u] = row
            has[u] = True
        self._recent_items = jnp.asarray(recent)  # (U, H)
        self._has_history = jnp.asarray(has)
