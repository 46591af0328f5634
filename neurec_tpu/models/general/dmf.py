"""DMF — deep matrix factorization (Xue et al., IJCAI 2017).

Parity with model/general_recommender/DMF.py:30-170: dual two-layer MLP
towers over raw interaction-matrix rows (user tower input: the user's
num_items row) and columns (item tower input: the item's num_users
column); output logit = relu(<u, v> / (|u|^2 |v|^2)) — the reference's
squared-norm "cosine" quirk is mirrored — fed to pointwise
cross-entropy/square loss with 1 + num_negatives instances per positive.

TPU-first: rows AND columns are scattered on device from padded
user-positives and item-positives (the reference materializes dense numpy
vectors per instance on the host — the framework's biggest memory hazard).
The reference's predict also uses the negative's column correctly, unlike
its training generator which looks up column(i) for negative j
(DMF.py:154 — a reference bug; intended semantics used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import pointwise_loss


@register("DMF")
class DMF(Recommender):
    data_kind = "pointwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        layers = list(config.get("layers", [200, 100]))
        self.first_layer_size = int(layers[0])
        self.last_layer_size = int(layers[-1])
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))

        user_padded = build_padded_positives(dataset.train_matrix)
        item_padded = build_padded_positives(dataset.train_matrix.T.tocsr())
        self._user_rows = jnp.asarray(user_padded.items)   # (U, Lu) pad=I
        self._item_rows = jnp.asarray(item_padded.items)   # (I, Li) pad=U

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ks = jax.random.split(rng, 8)
        f, l = self.first_layer_size, self.last_layer_size
        return {
            "u_w1": init(ks[0], (self.num_items, f)),
            "u_b1": init(ks[1], (f,)),
            "u_w2": init(ks[2], (f, l)),
            "u_b2": init(ks[3], (l,)),
            "v_w1": init(ks[4], (self.num_users, f)),
            "v_b1": init(ks[5], (f,)),
            "v_w2": init(ks[6], (f, l)),
            "v_b2": init(ks[7], (l,)),
        }

    def _user_tower(self, params, users):
        """Row @ W1 as a padded gather-sum (row is 0/1), then dense."""
        rows = self._user_rows[users]                       # (B, Lu)
        w1_ext = jnp.concatenate(
            [params["u_w1"], jnp.zeros((1, self.first_layer_size))], axis=0
        )
        h1 = jax.nn.relu(jnp.sum(w1_ext[rows], axis=1) + params["u_b1"])
        return h1 @ params["u_w2"] + params["u_b2"]

    def _item_tower(self, params, items):
        cols = self._item_rows[items]                       # (B, Li)
        w1_ext = jnp.concatenate(
            [params["v_w1"], jnp.zeros((1, self.first_layer_size))], axis=0
        )
        h1 = jax.nn.relu(jnp.sum(w1_ext[cols], axis=1) + params["v_b1"])
        return h1 @ params["v_w2"] + params["v_b2"]

    def _logit(self, u_vec, v_vec):
        dot = jnp.sum(u_vec * v_vec, axis=-1)
        norm = jnp.sum(jnp.square(u_vec), axis=-1) * jnp.sum(
            jnp.square(v_vec), axis=-1
        )
        return jax.nn.relu(dot / jnp.maximum(norm, 1e-12))

    def loss(self, params, batch, weights):
        u = self._user_tower(params, batch["users"])
        v = self._item_tower(params, batch["items"])
        y = self._logit(u, v)
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        )

    def predict(self, params, users):
        u = self._user_tower(params, users)                 # (B, l)
        v = self._item_tower(params, jnp.arange(self.num_items))  # (I, l)
        dot = u @ v.T
        norm = jnp.sum(jnp.square(u), axis=1)[:, None] * jnp.sum(
            jnp.square(v), axis=1
        )[None, :]
        return jax.nn.relu(dot / jnp.maximum(norm, 1e-12))
