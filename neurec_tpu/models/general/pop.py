"""Pop — item-popularity baseline (model/general_recommender/Pop.py:5-31).

Scores every item by its training interaction count; no training.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from neurec_tpu.models.base import Recommender, register


@register("Pop")
class Pop(Recommender):
    data_kind = "none"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        counts = np.asarray(
            (dataset.train_matrix != 0).sum(axis=0)
        ).reshape(-1)
        self._scores = jnp.asarray(counts.astype(np.float32))
        self.epochs = 0

    def init_params(self, rng):
        return {"item_count": self._scores}

    def loss(self, params, batch, weights):
        raise RuntimeError("Pop has no training loss")

    def predict(self, params, users):
        return jnp.broadcast_to(
            params["item_count"][None, :], (users.shape[0], self.num_items)
        )

    def eval_embeddings(self, params, users):
        ones = jnp.ones((users.shape[0], 1), jnp.float32)
        return ones, params["item_count"][:, None].astype(jnp.float32)
