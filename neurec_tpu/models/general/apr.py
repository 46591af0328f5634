"""APR / AMF — adversarial personalized ranking (He et al., SIGIR 2018).

Parity with model/general_recommender/APR.py:40-125: BPR-MF whose
optimization loss adds an adversarial BPR term computed with FGSM-style
perturbations on the looked-up embeddings:

* adv='grad':   delta = eps * row-l2-normalized d(bpr_loss)/d(table)
  (full-table gradient of the batch loss, rows outside the batch get zero
  delta, APR.py:106-119) — here computed with jax.grad + stop_gradient;
* adv='random': delta = eps * row-normalized truncated normal noise;
* opt_loss = bpr + reg*l2(tables) + [epoch >= adv_epoch] * reg_adv * bpr_adv
  (the reference's adv_epoch phase-in switch, conf/APR.properties).

The reference runs two sess.run phases per step (assign deltas, then
optimize); here both phases fuse into one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss


def _row_normalize(x, eps=1e-12):
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), eps)
    )


@register("APR")
class APR(Recommender):
    data_kind = "pairwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg = float(config.get("reg", 0.0))
        self.reg_adv = float(config.get("reg_adv", 1.0))
        self.adv_epoch = int(config.get("adv_epoch", 0))
        self.adv = config.get("adv", "grad")
        self.eps = float(config.get("eps", 0.5))
        self.adver = bool(config.get("adver", 1))
        self.init_method = config.get("init_method", "tnormal")
        self.stddev = float(config.get("stddev", 0.01))

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ku, ki = jax.random.split(rng)
        return {
            "embedding_P": init(ku, (self.num_users, self.embedding_size)),
            "embedding_Q": init(ki, (self.num_items, self.embedding_size)),
        }

    def _bpr(self, P, Q, users, pos, neg, weights):
        y = jnp.sum(P[users] * (Q[pos] - Q[neg]), axis=-1)
        return jnp.sum(jax.nn.softplus(-y) * weights)

    def loss(self, params, batch, weights):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        P, Q = params["embedding_P"], params["embedding_Q"]
        base = self._bpr(P, Q, users, pos, neg, weights)
        opt_loss = base + self.reg * l2_loss(P, Q)
        if not self.adver:
            return opt_loss

        if self.adv == "grad":
            gP, gQ = jax.grad(
                lambda p, q: self._bpr(p, q, users, pos, neg, weights),
                argnums=(0, 1),
            )(jax.lax.stop_gradient(P), jax.lax.stop_gradient(Q))
            delta_P = _row_normalize(gP) * self.eps
            delta_Q = _row_normalize(gQ) * self.eps
        else:  # random
            k1, k2 = jax.random.split(batch["rng"])
            nP = 0.01 * jax.random.truncated_normal(k1, -2.0, 2.0, P.shape)
            nQ = 0.01 * jax.random.truncated_normal(k2, -2.0, 2.0, Q.shape)
            delta_P = _row_normalize(nP) * self.eps
            delta_Q = _row_normalize(nQ) * self.eps

        adv_loss = self._bpr(P + delta_P, Q + delta_Q, users, pos, neg, weights)
        adv_on = (batch["epoch"] >= self.adv_epoch).astype(jnp.float32)
        return opt_loss + adv_on * self.reg_adv * adv_loss

    def predict(self, params, users):
        return params["embedding_P"][users] @ params["embedding_Q"].T

    def eval_embeddings(self, params, users):
        return params["embedding_P"][users], params["embedding_Q"]
