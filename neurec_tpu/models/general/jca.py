"""JCA — joint collaborative autoencoder (Zhu et al., WWW 2019).

Parity with model/general_recommender/JCA.py:25-215:

* user AE: full interaction rows -> hidden(g_act) -> decoded rows(f_act);
* item AE: full interaction columns -> hidden scaled by a per-item factor
  vector -> decoded columns;
* prediction = average of both decoders on the (user-block x item-block)
  sub-matrix; pairwise hinge max(0, neg - pos + margin) over positive
  coordinates vs per-positive sampled negative coordinates inside the
  sub-block; reg * 0.5 * l2(weights + biases);
* training iterates a random user-block x item-block grid per epoch
  (JCA.py:128-160).

On-device deviation: the reference samples ``num_neg`` negative columns per
positive WITHOUT replacement from the sub-block's zero entries; here
negative columns are drawn uniformly per cell and collisions with positives
get weight 0 (bounded, documented approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.multivae import _activation
from neurec_tpu.ops.initializers import get_initializer


@register("JCA")
class JCA(Recommender):
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.hidden_neuron = int(config.get("hidden_neuron", 160))
        self.reg = float(config.get("reg", 0.001))
        self.f_act = _activation(config.get("f_act", "sigmoid"))
        self.g_act = _activation(config.get("g_act", "sigmoid"))
        self.margin = float(config.get("margin", 0.15))
        self.neg_sample_rate = int(config.get("num_neg", 1))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))

        user_padded = build_padded_positives(dataset.train_matrix)
        item_padded = build_padded_positives(dataset.train_matrix.T.tocsr())
        self._user_rows = jnp.asarray(user_padded.items)
        self._item_rows = jnp.asarray(item_padded.items)
        # dense-hoist budget: ~3 (U, I) f32 transients live at the hoist
        # (all-users rows input, u_dec output, resident average)
        if 12 * self.num_users * self.num_items > 512 * 1024 * 1024:
            self.eval_dense_scores = None  # getattr -> absent

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ks = jax.random.split(rng, 9)
        h = self.hidden_neuron
        return {
            "UV": init(ks[0], (self.num_items, h)),
            "UW": init(ks[1], (h, self.num_items)),
            "Ub1": init(ks[2], (1, h)),
            "Ub2": init(ks[3], (1, self.num_items)),
            "IV": init(ks[4], (self.num_users, h)),
            "IW": init(ks[5], (h, self.num_users)),
            "Ib1": init(ks[6], (1, h)),
            "Ib2": init(ks[7], (1, self.num_users)),
            "I_factor": init(ks[8], (1, self.num_items)),
        }

    def _rows_dense(self, idx):
        rows = self._user_rows[idx]
        ext = jnp.zeros((idx.shape[0], self.num_items + 1))
        ext = ext.at[jnp.arange(idx.shape[0])[:, None], rows].set(1.0)
        return ext[:, : self.num_items]

    def _cols_dense(self, idx):
        cols = self._item_rows[idx]
        ext = jnp.zeros((idx.shape[0], self.num_users + 1))
        ext = ext.at[jnp.arange(idx.shape[0])[:, None], cols].set(1.0)
        return ext[:, : self.num_users]

    def _u_decode(self, params, r_u):
        h = self.g_act(r_u @ params["UV"] + params["Ub1"])
        return self.f_act(h @ params["UW"] + params["Ub2"])   # (Bu, I)

    def _i_decode(self, params, r_i_t, col_idx):
        factor = params["I_factor"][0][col_idx][:, None]      # (Bc, 1)
        h = self.g_act((r_i_t @ params["IV"] + params["Ib1"]) * factor)
        return self.f_act(h @ params["IW"] + params["Ib2"])   # (Bc, U)

    def _sub_decoder(self, params, row_idx, col_idx):
        r_u = self._rows_dense(row_idx)                       # (Bu, I)
        r_i_t = self._cols_dense(col_idx)                     # (Bc, U)
        u_dec = self._u_decode(params, r_u)[:, col_idx]       # (Bu, Bc)
        i_dec = self._i_decode(params, r_i_t, col_idx)[:, row_idx]  # (Bc, Bu)
        return (u_dec + i_dec.T) / 2.0, r_u[:, col_idx]

    def build_epoch(self, trainer):
        B = self.batch_size
        nU = -(-self.num_users // B)
        nI = -(-self.num_items // B)
        tx = trainer.tx

        def step(carry, xs):
            params, opt_state = carry
            row_idx, row_w, col_idx, col_w, key = xs
            row_idx, row_w = trainer.dp_constrain(row_idx, row_w)

            def loss_fn(p):
                dec, r_sub = self._sub_decoder(p, row_idx, col_idx)
                w_cell = (row_w[:, None] * col_w[None, :]) * r_sub  # positives
                neg_cols = jax.random.randint(
                    key, (B, B, self.neg_sample_rate), 0, B
                )
                gather_row = jax.vmap(lambda row, idx: row[idx])
                neg_vals = gather_row(dec, neg_cols)          # (Bu, Bc, S)
                neg_is_pos = gather_row(r_sub, neg_cols)
                neg_valid_col = col_w[neg_cols]
                hinge = jnp.maximum(
                    neg_vals - dec[:, :, None] + self.margin, 0.0
                )
                w = w_cell[:, :, None] * (1.0 - neg_is_pos) * neg_valid_col
                cost1 = jnp.sum(hinge * w)
                # reference: reg * 0.5 * l2_loss(...) with l2_loss = sum of
                # 0.5*||.||^2  =>  reg * 0.25 * sum of squared norms
                cost2 = self.reg * 0.25 * sum(
                    jnp.sum(jnp.square(p[k]))
                    for k in ("UW", "UV", "IW", "IV", "Ib1", "Ib2",
                              "Ub1", "Ub2")
                )
                return cost1 + cost2

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            kr, kc, kn = jax.random.split(key, 3)
            rperm = jax.random.permutation(kr, nU * B)
            cperm = jax.random.permutation(kc, nI * B)
            rows = jnp.where(rperm < self.num_users, rperm, 0).astype(jnp.int32)
            row_w = (rperm < self.num_users).astype(jnp.float32)
            cols = jnp.where(cperm < self.num_items, cperm, 0).astype(jnp.int32)
            col_w = (cperm < self.num_items).astype(jnp.float32)

            rows = rows.reshape(nU, B)
            row_w = row_w.reshape(nU, B)
            cols = cols.reshape(nI, B)
            col_w = col_w.reshape(nI, B)
            # all (row block, col block) pairs
            ri = jnp.repeat(jnp.arange(nU), nI)
            ci = jnp.tile(jnp.arange(nI), nU)
            keys = jax.random.split(kn, nU * nI)
            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                (rows[ri], row_w[ri], cols[ci], col_w[ci], keys),
            )
            return params, opt_state, jnp.sum(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("JCA uses build_epoch (data_kind='custom')")

    def eval_dense_scores(self, params):
        """Evaluator/serving hoist hook (review r5): predict runs the
        FULL item decoder — an (I, U) matrix — for every eval batch
        inside the scan; hoisting computes the item side once per eval
        call. All-users u_dec adds (U, I)-scale transients on top of the
        (I, U) one each batch already paid, so the hook un-advertises
        over a byte budget (__init__). Row-independent math keeps it
        bit-exact with batched predict."""
        return self.predict(
            params, jnp.arange(self.num_users, dtype=jnp.int32)
        )

    def predict(self, params, users):
        r_u = self._rows_dense(users)
        u_dec = self._u_decode(params, r_u)                    # (B, I)
        r_i_t = self._cols_dense(jnp.arange(self.num_items))
        i_dec = self._i_decode(
            params, r_i_t, jnp.arange(self.num_items)
        )                                                      # (I, U)
        return (u_dec + i_dec.T[users]) / 2.0
