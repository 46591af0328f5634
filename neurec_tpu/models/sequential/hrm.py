"""HRM — hierarchical representation model (Wang et al., SIGIR 2015).

Parity with model/sequential_recommender/HRM.py: session representation =
avg/max pooling over the last ``high_order`` item embeddings; hybrid user
representation = avg/max pooling over [user_emb, session_rep]; score =
<hybrid, item_emb> (HRM.py:54-85). Pointwise training
(TimeOrderPointwiseSampler), reg_mf * l2(batch lookups).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pointwise_loss


@register("HRM")
class HRM(SequentialMixin, Recommender):
    needs_time = True
    data_kind = "time_pointwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg_mf = float(config.get("reg_mf", 0.0))
        self.high_order = int(config.get("high_order", 2))
        self.session_agg = config.get("session_agg", "avg")
        self.pre_agg = config.get("pre_agg", "avg")
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self._setup_recent(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2 = jax.random.split(rng)
        return {
            "user_emb": init(k1, (self.num_users, self.embedding_size)),
            "item_emb": init(k2, (self.num_items, self.embedding_size)),
        }

    def _hybrid(self, params, users, recent):
        """(B, d) hybrid user representation from (B, H) recent items."""
        u = params["user_emb"][users]                     # (B, d)
        r = params["item_emb"][recent]                    # (B, H, d)
        if self.high_order > 1:
            if self.session_agg == "max":
                sess = jnp.max(r, axis=1)
            else:
                sess = jnp.mean(r, axis=1)
        else:
            sess = r[:, 0]
        pair = jnp.stack([u, sess], axis=1)               # (B, 2, d)
        if self.pre_agg == "max":
            return jnp.max(pair, axis=1), u, r
        return jnp.mean(pair, axis=1), u, r

    def loss(self, params, batch, weights):
        recent = batch["recent_items"].reshape(-1, self.high_order)
        hybrid, u, r = self._hybrid(params, batch["users"], recent)
        q = params["item_emb"][batch["items"]]
        y = jnp.sum(hybrid * q, axis=-1)
        w = weights[:, None]
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mf * l2_loss(u * w, r * weights[:, None, None], q * w)

    def predict(self, params, users):
        recent = self._recent_items[users]
        hybrid, _, _ = self._hybrid(params, users, recent)
        return hybrid @ params["item_emb"].T

    def eval_embeddings(self, params, users):
        recent = self._recent_items[users]
        hybrid, _, _ = self._hybrid(params, users, recent)
        return hybrid, params["item_emb"]
