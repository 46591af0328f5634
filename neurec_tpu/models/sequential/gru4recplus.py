"""GRU4RecPlus — GRU4Rec with bpr-max / top1-max losses and extra
popularity-sampled negatives (Hidasi & Karatzoglou, CIKM 2018).

Parity with model/sequential_recommender/GRU4RecPlus.py:40-175: per step,
``n_sample`` extra negatives drawn with probability proportional to item
popularity^sample_alpha (inverse-CDF on the popularity cumsum — here via
on-device searchsorted inside the scan); losses weight each negative by a
diagonal-masked softmax over the batch logits (``_softmax_neg``); bpr-max
adds ``bpr_reg`` * softmax-weighted squared logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.models.base import register
from neurec_tpu.models.sequential.gru4rec import GRU4Rec


@register("GRU4RecPlus")
class GRU4RecPlus(GRU4Rec):
    _valid_losses = ("bpr_max", "top1_max")

    def __init__(self, dataset, config):
        self.bpr_reg = float(config.get("bpr_reg", 1.0))
        self.n_sample = int(config.get("n_sample", 2048))
        self.sample_alpha = float(config.get("sample_alpha", 0.75))
        super().__init__(dataset, config)

        counts = np.asarray((dataset.train_matrix != 0).sum(axis=0)).reshape(-1)
        pop = np.power(np.maximum(counts.astype(np.float64), 0), self.sample_alpha)
        cumsum = np.cumsum(pop)
        self._pop_cumsum = jnp.asarray(
            (cumsum / max(cumsum[-1], 1e-12)).astype(np.float32)
        )

    def _extra_negatives(self, key):
        u = jax.random.uniform(key, (self.n_sample,))
        idx = jnp.searchsorted(self._pop_cumsum, u)
        return jnp.minimum(idx, self.num_items - 1).astype(jnp.int32)

    def _softmax_neg(self, logits, valid_cols, B):
        C = logits.shape[1]
        eye = jnp.eye(B, C)
        hm = (1.0 - eye) * valid_cols[None, :]
        masked = logits * hm
        masked = masked - jnp.max(masked, axis=1, keepdims=True)
        e_x = jnp.exp(masked) * hm
        return e_x / jnp.maximum(jnp.sum(e_x, axis=1, keepdims=True), 1e-24)

    def _loss_from_logits(self, logits, valid_rows, valid_cols, B):
        softmax_scores = self._softmax_neg(logits, valid_cols, B)
        pos = jnp.diagonal(logits[:, :B])[:, None]
        if self.loss_name == "bpr_max":
            prob = jax.nn.sigmoid(pos - logits)
            prob = jnp.sum(prob * softmax_scores, axis=1)
            loss = -jnp.log(prob + 1e-24)
            reg = jnp.sum(jnp.square(logits) * softmax_scores, axis=1)
            per_row = loss + self.bpr_reg * reg
        else:  # top1_max
            prob = jax.nn.sigmoid(-pos + logits) + jax.nn.sigmoid(
                jnp.square(logits)
            )
            per_row = jnp.sum(prob * softmax_scores, axis=1)
        return jnp.sum(per_row * valid_rows) / jnp.maximum(
            jnp.sum(valid_rows), 1.0
        )
