"""TransRec — translation-based recommendation (He et al., RecSys 2017).

Parity with model/sequential_recommender/TransRec.py: training score =
b_i - ||u + g + prev - i||^2 (squared L2, TransRec.py:69-79); eval score =
b_i - ||u + g + prev - i||_2 (sqrt L2, TransRec.py:105-110) — the
reference's squared/unsquared train-vs-eval mismatch is mirrored since
ranking is monotone in either. Pairwise or pointwise, reg_mf * l2(lookups +
global embedding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss


@register("TransRec")
class TransRec(SequentialMixin, Recommender):
    needs_time = True
    high_order = 1

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg_mf = float(config.get("reg_mf", 0.0))
        self.is_pairwise = bool(config.get("is_pairwise", True))
        self.loss_function = config.get("loss_function", "bpr")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "time_pairwise" if self.is_pairwise else "time_pointwise"
        self._setup_recent(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d = self.embedding_size
        return {
            "user_emb": init(k1, (self.num_users, d)),
            "item_emb": init(k2, (self.num_items, d)),
            "item_bias": init(k3, (self.num_items,)),
            "global_emb": init(k4, (1, d)),
        }

    def _score(self, params, users, recent, items):
        u = params["user_emb"][users]
        prev = params["item_emb"][recent]
        q = params["item_emb"][items]
        b = params["item_bias"][items]
        vec = u + params["global_emb"] + prev - q
        y = b - jnp.sum(jnp.square(vec), axis=-1)
        return y, (u, prev, q, b)

    def loss(self, params, batch, weights):
        users = batch["users"]
        recent = batch["recent_items"].reshape(-1)
        w = weights[:, None]
        if self.is_pairwise:
            y_pos, (u, prev, q1, b1) = self._score(
                params, users, recent, batch["pos_items"]
            )
            y_neg, (_, _, q2, b2) = self._score(
                params, users, recent, batch["neg_items"]
            )
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.reg_mf * l2_loss(
                u * w, prev * w, q2 * w, q1 * w, b1 * weights, b2 * weights,
                params["global_emb"],
            )
        y, (u, prev, q, b) = self._score(params, users, recent, batch["items"])
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mf * l2_loss(
            u * w, prev * w, q * w, b * weights, params["global_emb"]
        )

    def predict(self, params, users):
        last = self._recent_items[users, -1]
        pre = params["user_emb"][users] + params["global_emb"] + (
            params["item_emb"][last]
        )                                                   # (B, d)
        # ||a-b||^2 = ||a||^2 + ||b||^2 - 2<a,b> — one MXU matmul, no (B,I,d)
        q = params["item_emb"]
        sq = (
            jnp.sum(jnp.square(pre), axis=1, keepdims=True)
            + jnp.sum(jnp.square(q), axis=1)[None, :]
            - 2.0 * pre @ q.T
        )
        dist = jnp.sqrt(jnp.maximum(sq, 1e-12))
        return params["item_bias"][None, :] - dist
