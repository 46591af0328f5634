"""NPE — neural personalized embedding (Nguyen & Takasu, IJCAI 2018).

Parity with model/sequential_recommender/NPE.py: score =
<relu(UI_u), relu(IU_i)> + <relu(IU_i), relu(sum of recent LI embeddings)>
(NPE.py:56-66); pointwise training with reg * l2(batch lookups); dropout in
the reference config is unused by its graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pointwise_loss


@register("NPE")
class NPE(SequentialMixin, Recommender):
    needs_time = True
    data_kind = "time_pointwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg = float(config.get("reg", 0.0))
        self.high_order = int(config.get("high_order", 3))
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self._setup_recent(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3 = jax.random.split(rng, 3)
        d = self.embedding_size
        return {
            "UI": init(k1, (self.num_users, d)),
            "IU": init(k2, (self.num_items, d)),
            "IL": init(k3, (self.num_items, d)),
        }

    def loss(self, params, batch, weights):
        recent = batch["recent_items"].reshape(-1, self.high_order)
        ui = params["UI"][batch["users"]]
        iu = params["IU"][batch["items"]]
        li = params["IL"][recent]                        # (B, H, d)
        ctx = jnp.sum(li, axis=1)
        y = jnp.sum(
            jax.nn.relu(ui) * jax.nn.relu(iu)
            + jax.nn.relu(iu) * jax.nn.relu(ctx),
            axis=-1,
        )
        w = weights[:, None]
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg * l2_loss(ui * w, iu * w, li * weights[:, None, None])

    def predict(self, params, users):
        recent = self._recent_items[users]
        ctx = jnp.sum(params["IL"][recent], axis=1)
        left = jax.nn.relu(params["UI"][users]) + jax.nn.relu(ctx)  # (B, d)
        return left @ jax.nn.relu(params["IU"]).T

    def eval_embeddings(self, params, users):
        recent = self._recent_items[users]
        ctx = jnp.sum(params["IL"][recent], axis=1)
        left = jax.nn.relu(params["UI"][users]) + jax.nn.relu(ctx)
        return left, jax.nn.relu(params["IU"])
