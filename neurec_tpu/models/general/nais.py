"""NAIS — neural attentive item similarity (He et al., TKDE 2018).

Parity with model/general_recommender/NAIS.py:85-180:

* attended set representation p = sum_j A_j q'_j with
  A = exp(h . act(W x_j + b)) / (sum exp)^beta, x_j = q'_j ⊙ q_i (prod,
  algorithm=0) or [q'_j; q_i] (concat, algorithm=1) (NAIS.py:151-175);
* score = num_idx^alpha * <p, q_i> + b_i (NOTE: +alpha, unlike FISM's
  -alpha — mirrored, NAIS.py:110);
* likefism training feeds: positives use set-minus-target (num_idx = n),
  negatives the full set (num_idx = n+1); lambda/gamma regs from
  ``regs[0:2]``; optional FISM pickle warm-start.

Attention masking deviation: the reference masks the softmax to the first
``num_idx`` padded positions (sequence_mask) which, for negatives, lets one
zero-padding row participate; here masking is by real slot validity.

Full-catalog predict is candidate-conditioned attention — O(I * L * d) per
user — computed one user at a time via lax.map (the reference repeats the
user's set per candidate item on the host, NAIS.py:246-256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss
from neurec_tpu.pretrain import try_load

_ACTS = {0: jax.nn.relu, 1: jax.nn.sigmoid, 2: jnp.tanh,
         "relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}


def _parse_act(value):
    if isinstance(value, str):
        return _ACTS[value.lower()]
    return _ACTS[int(value)]


@register("NAIS")
class NAIS(Recommender):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.weight_size = int(config.get("weight_size", 16))
        regs = config.get("regs", [1e-7, 1e-7, 1e-5])
        self.lambda_bilinear = float(regs[0])
        self.gamma_bilinear = float(regs[1])
        self.eta_bilinear = float(regs[2]) if len(regs) > 2 else 0.0
        self.alpha = float(config.get("alpha", 0.0))
        self.beta = float(config.get("beta", 0.5))
        self.algorithm = int(config.get("algorithm", 0))
        self.activation = _parse_act(config.get("activation", 0))
        self.is_pairwise = bool(config.get("is_pairwise", False))
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 4)))
        self.embed_init_method = config.get("embed_init_method", "tnormal")
        self.weight_init_method = config.get("weight_init_method", "he_normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.pretrain_file = config.get("pretrain_file", "")
        self.data_kind = "pairwise" if self.is_pairwise else "pointwise"

        padded = build_padded_positives(dataset.train_matrix)
        self._rows = jnp.asarray(padded.items)
        self._lens = jnp.asarray(padded.lengths)

    def init_params(self, rng):
        e_init = get_initializer(self.embed_init_method, self.stddev)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d, w = self.embedding_size, self.weight_size
        r = (self.algorithm + 1) * d
        params = {
            "Q_set": e_init(k1, (self.num_items, d)),
            "Q": e_init(k2, (self.num_items, d)),
            "bias": jnp.zeros((self.num_items,)),
            "W": w_init(k3, (r, w)),
            "b": w_init(k4, (1, w)),
            "h": jnp.ones((w, 1)),
        }
        loaded = try_load(self.pretrain_file)
        if loaded is not None:
            fism = loaded[0]
            params["Q_set"] = jnp.asarray(fism[0])
            params["Q"] = jnp.asarray(fism[1])
            params["bias"] = jnp.asarray(fism[2])
        return params

    def _att_pool(self, params, set_emb, q_target, slot_mask):
        """set_emb (..., L, d); q_target (..., d) -> attended (..., d)."""
        if self.algorithm == 0:
            x = set_emb * q_target[..., None, :]
        else:
            tiled = jnp.broadcast_to(
                q_target[..., None, :], set_emb.shape
            )
            x = jnp.concatenate([set_emb, tiled], axis=-1)
        mlp = self.activation(x @ params["W"] + params["b"])
        logits = (mlp @ params["h"])[..., 0]                 # (..., L)
        exp_a = jnp.exp(logits) * slot_mask
        exp_sum = jnp.power(
            jnp.maximum(jnp.sum(exp_a, axis=-1, keepdims=True), 1e-12), self.beta
        )
        att = exp_a / exp_sum
        return jnp.sum(att[..., None] * set_emb, axis=-2)

    def _set_table(self, params):
        return jnp.concatenate(
            [params["Q_set"], jnp.zeros((1, self.embedding_size))], axis=0
        )

    def _score_batch(self, params, users, items, exclude_target):
        rows = self._rows[users]                              # (B, L)
        n = self._lens[users].astype(jnp.float32)
        slot_mask = (rows < self.num_items).astype(jnp.float32)
        if exclude_target is not None:
            hit = (rows == exclude_target[:, None]).astype(jnp.float32)
            slot_mask = slot_mask * (1.0 - hit)
        set_emb = self._set_table(params)[rows]               # (B, L, d)
        q = params["Q"][items]
        p = self._att_pool(params, set_emb, q, slot_mask)
        num_idx = (n + 1.0) if exclude_target is None else n
        coeff = jnp.power(jnp.maximum(num_idx, 1.0), self.alpha)
        y = coeff * jnp.sum(p * q, axis=-1) + params["bias"][items]
        return y, set_emb, q

    def loss(self, params, batch, weights):
        users = batch["users"]
        w = weights[:, None]
        w3 = weights[:, None, None]
        if self.is_pairwise:
            y_pos, se, q1 = self._score_batch(
                params, users, batch["pos_items"], batch["pos_items"]
            )
            y_neg, _, q2 = self._score_batch(
                params, users, batch["neg_items"], None
            )
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.lambda_bilinear * l2_loss(se * w3) + (
                self.gamma_bilinear * l2_loss(q2 * w, q1 * w)
            ) + self.eta_bilinear * l2_loss(params["W"])
        items = batch["items"]
        labels = batch["labels"]
        rows = self._rows[users]
        n = self._lens[users].astype(jnp.float32)
        slot_mask = (rows < self.num_items).astype(jnp.float32)
        hit = (rows == items[:, None]).astype(jnp.float32) * labels[:, None]
        slot_mask = slot_mask * (1.0 - hit)
        set_emb = self._set_table(params)[rows]
        q = params["Q"][items]
        p = self._att_pool(params, set_emb, q, slot_mask)
        num_idx = jnp.where(labels > 0, n, n + 1.0)
        coeff = jnp.power(jnp.maximum(num_idx, 1.0), self.alpha)
        y = coeff * jnp.sum(p * q, axis=-1) + params["bias"][items]
        return pointwise_loss(
            self.loss_function, labels, y, weights=weights
        ) + self.lambda_bilinear * l2_loss(set_emb * w3) + (
            self.gamma_bilinear * l2_loss(q * w)
        ) + self.eta_bilinear * l2_loss(params["W"])

    def predict(self, params, users):
        set_table = self._set_table(params)
        Q = params["Q"]
        bias = params["bias"]

        def one_user(u):
            row = self._rows[u]                               # (L,)
            n = self._lens[u].astype(jnp.float32)
            slot_mask = (row < self.num_items).astype(jnp.float32)
            set_emb = set_table[row]                          # (L, d)
            # attended rep per candidate item: (I, d)
            p = self._att_pool(
                params,
                jnp.broadcast_to(set_emb[None], (Q.shape[0],) + set_emb.shape),
                Q,
                slot_mask[None, :],
            )
            coeff = jnp.power(jnp.maximum(n, 1.0), self.alpha)
            return coeff * jnp.sum(p * Q, axis=-1) + bias

        return jax.lax.map(one_user, users)
