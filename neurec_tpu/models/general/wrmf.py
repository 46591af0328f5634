"""WRMF — weighted regularized MF via implicit-feedback ALS (Hu et al., ICDM 2008).

Parity with model/general_recommender/WRMF.py:25-106: confidence C = alpha
on observed entries, preference P = 1 on observed; per-epoch closed-form
alternating solves

    x_u = (Y^T Y + Y^T Cu Y + reg I)^-1 Y^T (Cu + 1) p_u
    y_i = (X^T X + X^T Ci X + reg I)^-1 X^T (Ci + 1) p_i

TPU-first: the reference solves ONE ROW PER sess.run with a scatter_update
(WRMF.py:50-85). Here, since C is alpha only on positives, Y^T Cu Y =
alpha * Yu^T Yu over the user's padded positive rows, and all users (then
all items) are solved in one vmapped batched jnp.linalg.solve — two
batched (d, d) solves per epoch, entirely on device. Solves stay in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer


@register("WRMF")
class WRMF(Recommender):
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.alpha = float(config.get("alpha", 1.0))
        self.reg_mf = float(config.get("reg_mf", 0.01))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))

        user_padded = build_padded_positives(dataset.train_matrix)
        item_padded = build_padded_positives(dataset.train_matrix.T.tocsr())
        self._user_rows = jnp.asarray(user_padded.items)  # (U, Lu) pad = I
        self._item_rows = jnp.asarray(item_padded.items)  # (I, Li) pad = U

    def make_optimizer(self):
        return optax.identity()

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": init(ku, (self.num_users, self.embedding_size)),
            "item_emb": init(ki, (self.num_items, self.embedding_size)),
        }

    def _solve_side(self, other_emb, rows):
        """Solve all rows of one side given the other side's embeddings.

        rows: (N, L) padded indices into other_emb (pad == len(other_emb)).
        """
        d = self.embedding_size
        table = jnp.concatenate([other_emb, jnp.zeros((1, d))], axis=0)
        gtg = other_emb.T @ other_emb + self.reg_mf * jnp.eye(d)

        def solve_one(row):
            y = table[row]                                # (L, d), zero pads
            a = gtg + self.alpha * (y.T @ y)
            b = (self.alpha + 1.0) * jnp.sum(y, axis=0)
            return jnp.linalg.solve(a, b)

        return jax.vmap(solve_one)(rows)

    def build_epoch(self, trainer):
        def epoch(params, opt_state, key, epoch_idx):
            del key, epoch_idx
            # DP over the vmapped per-row solves (rows constrained to
            # P('data') when the counts divide the axis)
            user_emb = self._solve_side(
                params["item_emb"], trainer.dp_constrain(self._user_rows)
            )
            item_emb = self._solve_side(
                user_emb, trainer.dp_constrain(self._item_rows)
            )
            params = {"user_emb": user_emb, "item_emb": item_emb}
            # squared preference-reconstruction error on positives as "loss"
            rows = self._user_rows
            table = jnp.concatenate(
                [item_emb, jnp.zeros((1, self.embedding_size))], axis=0
            )
            pred = jnp.einsum("ud,uld->ul", user_emb, table[rows])
            valid = (rows < self.num_items).astype(jnp.float32)
            loss = jnp.sum(jnp.square((1.0 - pred) * valid)) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
            return params, opt_state, loss

        return jax.jit(epoch, donate_argnums=(0,))

    def loss(self, params, batch, weights):
        raise RuntimeError("WRMF uses closed-form ALS (data_kind='custom')")

    def predict(self, params, users):
        return params["user_emb"][users] @ params["item_emb"].T

    def eval_embeddings(self, params, users):
        return params["user_emb"][users], params["item_emb"]
