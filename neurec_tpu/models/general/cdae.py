"""CDAE — collaborative denoising autoencoder (Wu et al., WSDM 2016).

Parity with model/general_recommender/CDAE.py:

* encoder: hidden = act(dropout(row) @ E_enc + u_emb + offset)
  (CDAE.py:62-70); row dropout mirrors ``dropout_sparse`` (zeros stay zero,
  kept entries scaled 1/keep);
* per-user sampled negatives are ADDED to the input row as pseudo-positives
  (CDAE.py:115 ``bat_sp_mat[idx, neg_items] = 1``) — mirrored;
* training loss only on the user's positives + sampled negatives:
  square or sigmoid CE summed + reg * l2(looked-up params) (CDAE.py:120-143);
* eval: batch_ratings = hidden @ E_dec^T + bias (CDAE.py:101).

Deviations (documented): negatives are ``num_neg`` per positive slot drawn
with replacement but NOT uniquified (the reference np.unique's them), and
the L2 term counts repeated items once per occurrence instead of once.

On-device: each user's positive slots come from the padded row; negative
slots are sampled inside the jitted step (ops/sampling.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.ae_common import DenseRowMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.sampling import sample_negatives


@register("CDAE")
class CDAE(DenseRowMixin, Recommender):
    data_kind = "dense_row"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.emb_size = int(config.get("hidden_dim", 64))
        self.learning_rate = float(config.get("lr", config.get("learning_rate", 0.001)))
        self.reg = float(config.get("reg", 0.001))
        self.dropout = float(config.get("dropout", 0.5))
        self.num_neg = int(config.get("num_neg", 5))
        self.loss_func = config.get("loss_func", "sigmoid_cross_entropy")
        hidden_act = config.get("hidden_act", "sigmoid")
        if hidden_act == "identity":
            self.hidden_act = lambda x: x
        elif hidden_act == "sigmoid":
            self.hidden_act = jax.nn.sigmoid
        else:
            raise ValueError("hidden activate function %s is invalid." % hidden_act)
        self._setup_rows(dataset)

    def init_params(self, rng):
        init = get_initializer("tnormal", 0.01)
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "user_emb": init(k1, (self.num_users, self.emb_size)),
            "en_emb": init(k2, (self.num_items, self.emb_size)),
            "en_offset": jnp.zeros((self.emb_size,)),
            "de_emb": init(k3, (self.num_items, self.emb_size)),
            "de_bias": jnp.zeros((self.num_items,)),
        }

    def _encode(self, params, users, rows, rng, training):
        if training and self.dropout > 0:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, rows.shape)
            rows = jnp.where(mask, rows / keep, 0.0)
        hidden = rows @ params["en_emb"] + params["user_emb"][users] + params["en_offset"]
        return self.hidden_act(hidden)

    def loss(self, params, batch, weights):
        users = batch["users"]
        B = users.shape[0]
        k_neg, k_drop = jax.random.split(batch["rng"])

        pos_rows = self._padded_items[users]               # (B, L) pad=num_items
        L = pos_rows.shape[1]
        slot_valid = pos_rows < self.num_items             # (B, L)
        negs = sample_negatives(
            k_neg, pos_rows, self.num_items, (L * self.num_neg,)
        )                                                   # (B, L*num_neg)

        # input row: positives + sampled negatives marked 1 (CDAE.py:115)
        ext = jnp.zeros((B, self.num_items + 1), jnp.float32)
        bidx = jnp.arange(B)[:, None]
        ext = ext.at[bidx, pos_rows].set(1.0)
        neg_slot_valid = jnp.repeat(slot_valid, self.num_neg, axis=1)
        neg_write = jnp.where(neg_slot_valid, negs, self.num_items)
        ext = ext.at[bidx, neg_write].set(1.0)
        rows = ext[:, : self.num_items]

        hidden = self._encode(params, users, rows, k_drop, training=True)  # (B,d)

        items = jnp.concatenate(
            [jnp.minimum(pos_rows, self.num_items - 1), negs], axis=1
        )                                                   # (B, L*(1+num_neg))
        labels = jnp.concatenate(
            [jnp.ones((B, L)), jnp.zeros((B, L * self.num_neg))], axis=1
        )
        entry_w = jnp.concatenate([slot_valid, neg_slot_valid], axis=1)
        entry_w = entry_w.astype(jnp.float32) * weights[:, None]

        de = params["de_emb"][items]                        # (B, E, d)
        ratings = jnp.einsum("bd,bed->be", hidden, de) + params["de_bias"][items]

        if self.loss_func == "square":
            model_loss = jnp.square(ratings - labels)
        elif self.loss_func == "sigmoid_cross_entropy":
            model_loss = (
                jnp.maximum(ratings, 0.0)
                - ratings * labels
                + jax.nn.softplus(-jnp.abs(ratings))
            )
        else:
            raise ValueError("%s is an invalid loss function." % self.loss_func)

        w2 = entry_w[:, :, None]
        reg_loss = 0.5 * (
            jnp.sum(jnp.square(params["en_emb"][items] * w2))
            + jnp.sum(jnp.square(params["de_emb"][items] * w2))
            + jnp.sum(jnp.square(params["de_bias"][items] * entry_w))
            + jnp.sum(jnp.square(params["user_emb"][users] * weights[:, None]))
            + jnp.sum(jnp.square(params["en_offset"]))
        )
        return jnp.sum(model_loss * entry_w) + self.reg * reg_loss

    def predict(self, params, users):
        rows = self.make_rows(users)
        hidden = self._encode(params, users, rows, None, training=False)
        return hidden @ params["de_emb"].T + params["de_bias"]

    def eval_embeddings(self, params, users):
        rows = self.make_rows(users)
        hidden = self._encode(params, users, rows, None, training=False)
        return self._affine_eval(hidden, params["de_emb"], params["de_bias"])
