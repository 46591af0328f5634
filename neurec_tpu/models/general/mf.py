"""MF — matrix factorization (BPRMF / GMF family).

Capability parity with model/general_recommender/MF.py:16-134:
score(u, i) = <p_u, q_i>; pairwise (bpr/hinge/square on score difference,
MF.py:66-69) or pointwise (cross_entropy/square, MF.py:70-72) training with
per-batch L2 regularization ``reg_mf * l2_loss(looked-up embeddings)``.

TPU-first: full-catalog prediction is one (B, d) x (d, I) matmul on device;
the user/item tables row-shard over the 'model' mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss


@register("MF")
class MF(Recommender):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg_mf = float(config.get("reg_mf", 0.0))
        self.is_pairwise = bool(config.get("is_pairwise", True))
        self.loss_function = config.get("loss_function", "bpr")
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "pairwise" if self.is_pairwise else "pointwise"

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": init(ku, (self.num_users, self.embedding_size)),
            "item_emb": init(ki, (self.num_items, self.embedding_size)),
        }

    def _score(self, params, users, items):
        p = params["user_emb"][users]
        q = params["item_emb"][items]
        return jnp.sum(p * q, axis=-1), p, q

    def loss(self, params, batch, weights):
        users = batch["users"]
        if self.is_pairwise:
            y_pos, p, q_pos = self._score(params, users, batch["pos_items"])
            y_neg, _, q_neg = self._score(params, users, batch["neg_items"])
            loss = pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            )
            reg = self.reg_mf * l2_loss(
                p * weights[:, None], q_neg * weights[:, None], q_pos * weights[:, None]
            )
        else:
            y, p, q = self._score(params, users, batch["items"])
            loss = pointwise_loss(
                self.loss_function, batch["labels"], y, weights=weights
            )
            reg = self.reg_mf * l2_loss(p * weights[:, None], q * weights[:, None])
        return loss + reg

    def predict(self, params, users):
        u = params["user_emb"][users]
        return u @ params["item_emb"].T

    def eval_embeddings(self, params, users):
        """Factorized eval form for the fused Pallas score+mask kernel."""
        return params["user_emb"][users], params["item_emb"]
