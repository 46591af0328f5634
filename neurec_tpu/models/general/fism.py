"""FISM — factored item similarity model (Kabbur et al., KDD 2013).

Parity with model/general_recommender/FISM.py:40-180 +
util/data_generator.py:5-54 (likefism feeds):

* score(u-set, i) = |set|^-alpha * <sum_{j in set} Q'_j, Q_i> + b_i;
* training instances per positive i: the positive uses the user's set
  MINUS i with num_idx = n, negatives use the full set with num_idx = n+1
  (data_generator.py:40-53); pairwise or pointwise losses with
  lambda/gamma split regularization (FISM.py:76-90).
  (The reference's pairwise generator mutates the item list while
  iterating, silently skipping half the positives — the intended
  non-mutating semantics are implemented here.)
* predict: full set, num_idx = n, one matmul against Q (the reference
  repeats the user's set once per candidate item, FISM.py:154-179 — a
  flops blow-up replaced by sum-then-matmul).

On-device: the ragged user sets live as padded sorted rows; the
"set minus target" representation is sum(all) - Q'(target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss


@register("FISM")
class FISM(Recommender):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.alpha = float(config.get("alpha", 0.0))
        self.lambda_bilinear = float(config.get("lambda", config.get("lambda_bilinear", 1e-6)))
        self.gamma_bilinear = float(config.get("gamma", config.get("gamma_bilinear", 1e-6)))
        self.is_pairwise = bool(config.get("is_pairwise", False))
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "pairwise" if self.is_pairwise else "pointwise"

        padded = build_padded_positives(dataset.train_matrix)
        self._rows = jnp.asarray(padded.items)
        self._lens = jnp.asarray(padded.lengths)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2 = jax.random.split(rng)
        return {
            "Q_set": init(k1, (self.num_items, self.embedding_size)),
            "Q": init(k2, (self.num_items, self.embedding_size)),
            "bias": jnp.zeros((self.num_items,)),
        }

    def _set_sum(self, params, users):
        """Sum of set embeddings over each user's full padded row."""
        rows = self._rows[users]                              # (B, L)
        table = jnp.concatenate(
            [params["Q_set"], jnp.zeros((1, self.embedding_size))], axis=0
        )
        return jnp.sum(table[rows], axis=1), self._lens[users].astype(jnp.float32)

    def _score(self, params, p, num_idx, items):
        q = params["Q"][items]
        coeff = jnp.power(jnp.maximum(num_idx, 1.0), -self.alpha)
        y = coeff * jnp.sum(p * q, axis=-1) + params["bias"][items]
        return y, q

    def loss(self, params, batch, weights):
        users = batch["users"]
        full_sum, n = self._set_sum(params, users)
        if self.is_pairwise:
            pos = batch["pos_items"]
            p_pos = full_sum - params["Q_set"][pos]          # set minus target
            y_pos, q1 = self._score(params, p_pos, n, pos)
            y_neg, q2 = self._score(params, full_sum, n + 1.0, batch["neg_items"])
            w = weights[:, None]
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.lambda_bilinear * l2_loss(p_pos * w) + (
                self.gamma_bilinear * l2_loss(q2 * w, q1 * w)
            )
        items = batch["items"]
        labels = batch["labels"]
        # positives exclude the target; negatives use the full set
        p = full_sum - params["Q_set"][items] * labels[:, None]
        num_idx = jnp.where(labels > 0, n, n + 1.0)
        y, q = self._score(params, p, num_idx, items)
        w = weights[:, None]
        return pointwise_loss(
            self.loss_function, labels, y, weights=weights
        ) + self.lambda_bilinear * l2_loss(p * w) + (
            self.gamma_bilinear * l2_loss(q * w)
        )

    def predict(self, params, users):
        p, n = self._set_sum(params, users)
        coeff = jnp.power(jnp.maximum(n, 1.0), -self.alpha)[:, None]
        return coeff * (p @ params["Q"].T) + params["bias"][None, :]

    def eval_embeddings(self, params, users):
        p, n = self._set_sum(params, users)
        coeff = jnp.power(jnp.maximum(n, 1.0), -self.alpha)[:, None]
        return self._affine_eval(coeff * p, params["Q"], params["bias"])
