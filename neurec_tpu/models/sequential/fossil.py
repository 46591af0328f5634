"""Fossil — fusing similarity models with Markov chains (He & McAuley, ICDM 2016).

Parity with model/sequential_recommender/Fossil.py:55-115 +
util/data_generator.py:57-111 (likefossil feeds):

* score = |set|^-alpha <sum_{j in set} P_j, Q_i>
        + <sum_t (eta_bias_t + eta_{u,t}) P_{recent_t}, Q_i> + b_i,
  recents ordered most-recent-first (the eta index convention);
* instances: every position idx >= high_order; positives use set-minus-
  target (num_idx = n-1), negatives the full set (num_idx = n);
* lambda/gamma/reg_eta split regularization.
  (The reference's pairwise generator has the same mutate-while-iterating
  bug as FISM's; intended semantics implemented.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss


@register("Fossil")
class Fossil(SequentialMixin, Recommender):
    needs_time = True

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.alpha = float(config.get("alpha", 0.5))
        regs = config.get("regs", [0.0, 0.0, 0.0])
        self.lambda_bilinear = float(regs[0])
        self.gamma_bilinear = float(regs[1])
        self.reg_eta = float(regs[2]) if len(regs) > 2 else 0.0
        self.high_order = int(config.get("high_order", 1))
        self.is_pairwise = bool(config.get("is_pairwise", False))
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "time_pairwise" if self.is_pairwise else "time_pointwise"

        padded = build_padded_positives(dataset.train_matrix)
        self._rows = jnp.asarray(padded.items)
        self._lens = jnp.asarray(padded.lengths)
        self._setup_recent(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d = self.embedding_size
        return {
            "P": init(k1, (self.num_items, d)),
            "Q": init(k2, (self.num_items, d)),
            "eta": init(k3, (self.num_users, self.high_order)),
            "eta_bias": init(k4, (1, self.high_order)),
            "bias": jnp.zeros((self.num_items,)),
        }

    def _p_table(self, params):
        return jnp.concatenate(
            [params["P"], jnp.zeros((1, self.embedding_size))], axis=0
        )

    def _short_term(self, params, users, recents_mrf):
        """recents most-recent-first (B, H) -> (B, d) weighted sum."""
        eta = params["eta_bias"] + params["eta"][users]       # (B, H)
        short_emb = self._p_table(params)[recents_mrf]        # (B, H, d)
        return jnp.sum(eta[:, :, None] * short_emb, axis=1), short_emb

    def _score(self, params, p, num_idx, short, items):
        q = params["Q"][items]
        coeff = jnp.power(jnp.maximum(num_idx, 1.0), -self.alpha)
        y = coeff * jnp.sum(p * q, axis=-1) + jnp.sum(short * q, axis=-1) + (
            params["bias"][items]
        )
        return y, q

    def loss(self, params, batch, weights):
        users = batch["users"]
        recents = batch["recent_items"].reshape(-1, self.high_order)[:, ::-1]
        rows = self._rows[users]
        n = self._lens[users].astype(jnp.float32)
        table = self._p_table(params)
        full_sum = jnp.sum(table[rows], axis=1)
        short, short_emb = self._short_term(params, users, recents)
        w = weights[:, None]
        w3 = weights[:, None, None]
        eta_reg = self.reg_eta * l2_loss(
            params["eta"][users] * w, params["eta_bias"]
        )
        if self.is_pairwise:
            pos = batch["pos_items"]
            p_pos = full_sum - params["P"][pos]
            y_pos, q1 = self._score(params, p_pos, n - 1.0, short, pos)
            y_neg, q2 = self._score(params, full_sum, n, short, batch["neg_items"])
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.lambda_bilinear * l2_loss(p_pos * w) + (
                self.gamma_bilinear * l2_loss(q2 * w, q1 * w, short_emb * w3)
            ) + eta_reg
        items = batch["items"]
        labels = batch["labels"]
        p = full_sum - params["P"][items] * labels[:, None]
        num_idx = jnp.where(labels > 0, n - 1.0, n)
        y, q = self._score(params, p, num_idx, short, items)
        return pointwise_loss(
            self.loss_function, labels, y, weights=weights
        ) + self.lambda_bilinear * l2_loss(p * w) + (
            self.gamma_bilinear * l2_loss(q * w, short_emb * w3)
        ) + eta_reg

    def predict(self, params, users):
        rows = self._rows[users]
        n = self._lens[users].astype(jnp.float32)
        table = self._p_table(params)
        full_sum = jnp.sum(table[rows], axis=1)
        recents = self._recent_items[users][:, ::-1]  # most recent first
        short, _ = self._short_term(params, users, recents)
        coeff = jnp.power(jnp.maximum(n, 1.0), -self.alpha)[:, None]
        return (coeff * full_sum + short) @ params["Q"].T + params["bias"][None, :]

    def eval_embeddings(self, params, users):
        rows = self._rows[users]
        n = self._lens[users].astype(jnp.float32)
        table = self._p_table(params)
        full_sum = jnp.sum(table[rows], axis=1)
        recents = self._recent_items[users][:, ::-1]
        short, _ = self._short_term(params, users, recents)
        coeff = jnp.power(jnp.maximum(n, 1.0), -self.alpha)[:, None]
        return self._affine_eval(
            coeff * full_sum + short, params["Q"], params["bias"]
        )
