"""MLP — neural CF with an MLP tower over [u; i] concat only.

Parity with model/general_recommender/MLP.py: score = sum(MLP([m_u; n_i]))
(MLP.py:56-72), pairwise or pointwise training with reg_mlp L2.
Full-catalog predict chunks items on device like NeuMF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss
from neurec_tpu.ops.towers import apply_dense_stack, init_dense_stack

_PREDICT_CHUNK = 4096


@register("MLP")
class MLP(Recommender):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.layers = list(config.get("layers", [64, 32, 16]))
        self.reg_mlp = float(config.get("reg_mlp", 0.0))
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 4)))
        self.is_pairwise = bool(config.get("is_pairwise", True))
        self.loss_function = config.get("loss_function", "bpr")
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "pairwise" if self.is_pairwise else "pointwise"

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3 = jax.random.split(rng, 3)
        half = self.layers[0] // 2
        return {
            "mlp_user": init(k1, (self.num_users, half)),
            "mlp_item": init(k2, (self.num_items, half)),
            "tower": init_dense_stack(k3, self.layers[0], self.layers),
        }

    def _forward(self, params, users, items):
        m = params["mlp_user"][users]
        n = params["mlp_item"][items]
        vec = apply_dense_stack(params["tower"], jnp.concatenate([m, n], axis=-1))
        return jnp.sum(vec, axis=-1), (m, n)

    def loss(self, params, batch, weights):
        users = batch["users"]
        w = weights[:, None]
        if self.is_pairwise:
            y_pos, (m, n1) = self._forward(params, users, batch["pos_items"])
            y_neg, (_, n2) = self._forward(params, users, batch["neg_items"])
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.reg_mlp * l2_loss(m * w, n2 * w, n1 * w)
        y, (m, n) = self._forward(params, users, batch["items"])
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mlp * l2_loss(m * w, n * w)

    def predict(self, params, users):
        B = users.shape[0]
        m = params["mlp_user"][users]
        num_items = self.num_items
        chunk = min(_PREDICT_CHUNK, num_items)
        n_chunks = -(-num_items // chunk)
        padded = n_chunks * chunk
        n_all = params["mlp_item"]
        if padded != num_items:
            n_all = jnp.pad(n_all, ((0, padded - num_items), (0, 0)))
        n_all = n_all.reshape(n_chunks, chunk, -1)

        def score_chunk(carry, n):
            mlp_in = jnp.concatenate(
                [
                    jnp.broadcast_to(m[:, None, :], (B, chunk, m.shape[-1])),
                    jnp.broadcast_to(n[None, :, :], (B, chunk, n.shape[-1])),
                ],
                axis=-1,
            )
            mlp = apply_dense_stack(params["tower"], mlp_in)
            return carry, jnp.sum(mlp, axis=-1)

        _, chunks = jax.lax.scan(score_chunk, 0, n_all)
        return jnp.moveaxis(chunks, 0, 1).reshape(B, padded)[:, :num_items]
