"""DeepICF — deep item-based CF (Xue et al., IJCAI 2018): NAIS attention +
a deep MLP over the attended interaction vector.

Parity with model/general_recommender/DeepICF.py:100-175:

* attended p (NAIS attention, beta-smoothed), scaled by num_idx^alpha;
* deep tower over (p ⊙ q_i): dense + optional batch-norm + relu per layer,
  scalar output + item bias, sigmoid -> probability (DeepICF.py:155-170);
* loss = log_loss(labels, prob) (mean) + lambda*l2(Q) + gamma*l2(Q_set) +
  eta*l2(W) — NOTE: regularization over the FULL tables (DeepICF.py:172-175);
* pointwise likefism feeds only.

Batch-norm deviation: the reference keeps moving averages for inference
(DeepICF.py:53-58); here batch statistics are used in both phases (the
functional trainer carries no mutable BN state).

Pretrain: FISM warm-start via `pretrain_file` is inherited from NAIS
(a `[Q_set, Q, bias]` pickle — see `neurec_tpu/pretrain.py`). The
reference's two-pickle path (DeepICF.py:186-197) passes the LIST of both
pickles where `_create_variables` expects the three FISM arrays
(DeepICF.py:68-81) and would crash if the files existed — the working
single-pickle semantics are kept, the broken `mlp_pretrain` leg is not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import register
from neurec_tpu.models.general.nais import NAIS
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss


@register("DeepICF")
class DeepICF(NAIS):
    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.n_hidden = list(config.get("layers", [64, 32, 16]))
        self.use_batch_norm = bool(config.get("batch_norm", False))
        self.is_pairwise = False
        self.data_kind = "pointwise"

    def init_params(self, rng):
        params = super().init_params(rng)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        normal = get_initializer("normal", 1.0)
        dims = [self.embedding_size] + self.n_hidden
        params["deep_w"] = []
        params["deep_b"] = []
        params["bn"] = []
        for i in range(len(self.n_hidden)):
            rng, k1, k2 = jax.random.split(rng, 3)
            params["deep_w"].append(w_init(k1, (dims[i], dims[i + 1])))
            params["deep_b"].append(normal(k2, (self.n_hidden[i],)))
            params["bn"].append(
                {"gamma": jnp.ones((self.n_hidden[i],)),
                 "beta": jnp.zeros((self.n_hidden[i],))}
            )
        rng, k1, k2 = jax.random.split(rng, 3)
        params["out_w"] = w_init(k1, (self.n_hidden[-1], 1))
        params["out_b"] = normal(k2, (1,))
        return params

    def _tower(self, params, x):
        """x (..., d) -> (...,) scalar via dense+bn+relu stack."""
        for i in range(len(self.n_hidden)):
            x = x @ params["deep_w"][i] + params["deep_b"][i]
            if self.use_batch_norm:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x, axis=axes, keepdims=True)
                var = jnp.var(x, axis=axes, keepdims=True)
                x = params["bn"][i]["gamma"] * (x - mean) * jax.lax.rsqrt(
                    var + 1e-3
                ) + params["bn"][i]["beta"]
            x = jax.nn.relu(x)
        return (x @ params["out_w"] + params["out_b"])[..., 0]

    def _prob(self, params, p_scaled, q, items):
        out = self._tower(params, p_scaled * q)
        return jax.nn.sigmoid(out + params["bias"][items])

    def loss(self, params, batch, weights):
        users = batch["users"]
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
        coeff = jnp.power(jnp.maximum(num_idx, 1.0), self.alpha)[:, None]
        prob = jnp.clip(self._prob(params, coeff * p, q, items), 1e-7, 1 - 1e-7)
        ce = -(labels * jnp.log(prob) + (1 - labels) * jnp.log(1 - prob))
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        return jnp.sum(ce * weights) / denom + (
            self.lambda_bilinear * l2_loss(params["Q"])
            + self.gamma_bilinear * l2_loss(params["Q_set"])
            + self.eta_bilinear * l2_loss(params["W"])
        )

    def predict(self, params, users):
        set_table = self._set_table(params)
        Q = params["Q"]

        def one_user(u):
            row = self._rows[u]
            n = self._lens[u].astype(jnp.float32)
            slot_mask = (row < self.num_items).astype(jnp.float32)
            set_emb = set_table[row]
            p = self._att_pool(
                params,
                jnp.broadcast_to(set_emb[None], (Q.shape[0],) + set_emb.shape),
                Q,
                slot_mask[None, :],
            )
            coeff = jnp.power(jnp.maximum(n, 1.0), self.alpha)
            return self._prob(
                params, coeff * p, Q, jnp.arange(self.num_items)
            )

        return jax.lax.map(one_user, users)
