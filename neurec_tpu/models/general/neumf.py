"""NeuMF — neural collaborative filtering (GMF element-product ⊕ MLP tower).

Parity with model/general_recommender/NeuMF.py:16-169:
score = sum(concat([p_u ⊙ q_i, MLP([m_u; n_i])])) (NeuMF.py:77-86, note: no
output projection — the prediction is the raw sum over the concatenated
vector, mirroring the reference). Pairwise or pointwise training with
separate reg_mf/reg_mlp L2 on looked-up embeddings (NeuMF.py:91-100).
Optional pickle warm-start from GMF/MLP pretrain files (NeuMF.py:106-121).

TPU-first: full-catalog prediction broadcasts each user against item chunks
on device (the reference runs one sess.run per user over all items,
NeuMF.py:164-169).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss
from neurec_tpu.ops.towers import apply_dense_stack, init_dense_stack
from neurec_tpu.pretrain import try_load

_PREDICT_CHUNK = 4096


@register("NeuMF")
class NeuMF(Recommender):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.layers = list(config.get("layers", [64, 32, 16]))
        self.reg_mf = float(config.get("reg_mf", 0.0))
        self.reg_mlp = float(config.get("reg_mlp", 0.0))
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 4)))
        self.is_pairwise = bool(config.get("is_pairwise", False))
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.mf_pretrain = config.get("mf_pretrain", "")
        self.mlp_pretrain = config.get("mlp_pretrain", "")
        self.data_kind = "pairwise" if self.is_pairwise else "pointwise"

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        half = self.layers[0] // 2
        params = {
            "mf_user": init(k1, (self.num_users, self.embedding_size)),
            "mf_item": init(k2, (self.num_items, self.embedding_size)),
            "mlp_user": init(k3, (self.num_users, half)),
            "mlp_item": init(k4, (self.num_items, half)),
            "tower": init_dense_stack(k5, self.layers[0], self.layers),
        }
        return self._try_warm_start(params)

    def _try_warm_start(self, params):
        """Load pickled [user_emb, item_emb] pretrain pairs if present."""
        loaded = try_load(self.mf_pretrain, self.mlp_pretrain)
        if loaded is not None:
            mf, mlp = loaded
            params["mf_user"] = jnp.asarray(mf[0])
            params["mf_item"] = jnp.asarray(mf[1])
            params["mlp_user"] = jnp.asarray(mlp[0])
            params["mlp_item"] = jnp.asarray(mlp[1])
        return params

    def _forward(self, params, users, items):
        """Score (user, item) pairs; also returns the looked-up embeddings."""
        p = params["mf_user"][users]
        q = params["mf_item"][items]
        m = params["mlp_user"][users]
        n = params["mlp_item"][items]
        mf_vec = p * q
        mlp_vec = apply_dense_stack(
            params["tower"], jnp.concatenate([m, n], axis=-1)
        )
        score = jnp.sum(mf_vec, axis=-1) + jnp.sum(mlp_vec, axis=-1)
        return score, (p, q, m, n)

    def loss(self, params, batch, weights):
        users = batch["users"]
        if self.is_pairwise:
            y_pos, (p, q1, m, n1) = self._forward(params, users, batch["pos_items"])
            y_neg, (_, q2, _, n2) = self._forward(params, users, batch["neg_items"])
            w = weights[:, None]
            return (
                pairwise_loss(self.loss_function, y_pos - y_neg, weights=weights)
                + self.reg_mf * l2_loss(p * w, q2 * w, q1 * w)
                + self.reg_mlp * l2_loss(m * w, n2 * w, n1 * w)
            )
        y, (p, q, m, n) = self._forward(params, users, batch["items"])
        w = weights[:, None]
        return (
            pointwise_loss(self.loss_function, batch["labels"], y, weights=weights)
            + self.reg_mf * l2_loss(p * w, q * w)
            + self.reg_mlp * l2_loss(m * w, n * w)
        )

    def predict(self, params, users):
        """(B, num_items) full-catalog scores, chunked over items."""
        B = users.shape[0]
        p = params["mf_user"][users]      # (B, d)
        m = params["mlp_user"][users]     # (B, h)
        num_items = self.num_items
        chunk = min(_PREDICT_CHUNK, num_items)
        n_chunks = -(-num_items // chunk)
        padded = n_chunks * chunk

        q_all = params["mf_item"]
        n_all = params["mlp_item"]
        if padded != num_items:
            q_all = jnp.pad(q_all, ((0, padded - num_items), (0, 0)))
            n_all = jnp.pad(n_all, ((0, padded - num_items), (0, 0)))
        q_all = q_all.reshape(n_chunks, chunk, -1)
        n_all = n_all.reshape(n_chunks, chunk, -1)

        def score_chunk(carry, qn):
            q, n = qn                       # (chunk, d), (chunk, h)
            mf = jnp.einsum("bd,cd->bc", p, q)
            mlp_in = jnp.concatenate(
                [
                    jnp.broadcast_to(m[:, None, :], (B, chunk, m.shape[-1])),
                    jnp.broadcast_to(n[None, :, :], (B, chunk, n.shape[-1])),
                ],
                axis=-1,
            )
            mlp = apply_dense_stack(params["tower"], mlp_in)
            return carry, mf + jnp.sum(mlp, axis=-1)

        _, chunks = jax.lax.scan(score_chunk, 0, (q_all, n_all))
        scores = jnp.moveaxis(chunks, 0, 1).reshape(B, padded)
        return scores[:, :num_items]
