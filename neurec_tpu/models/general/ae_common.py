"""Shared machinery for the dense-row autoencoder family
(MultiVAE / MultiDAE / DAE / CDAE / JCA / CFGAN / DMF).

The reference builds dense (B, num_items) user rows on the host per batch
(MultiVAE.py:152-165, DAE.py:95-100); here every model carries the padded
per-user positive rows on device and scatters the dense row inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from neurec_tpu.data.padded import build_padded_positives


class DenseRowMixin:
    """Adds device-side train-row reconstruction to a Recommender."""

    def _setup_rows(self, dataset):
        padded = build_padded_positives(dataset.train_matrix)
        self._padded_items = jnp.asarray(padded.items)
        self._padded_lens = jnp.asarray(padded.lengths)

    def make_rows(self, users) -> jnp.ndarray:
        """(B, num_items) float32 binary interaction rows for ``users``."""
        rows = self._padded_items[users]            # (B, L), pad == num_items
        B = users.shape[0]
        ext = jnp.zeros((B, self.num_items + 1), jnp.float32)
        ext = ext.at[jnp.arange(B)[:, None], rows].set(1.0)
        return ext[:, : self.num_items]
