"""MultiVAE — variational autoencoder for CF (Liang et al., WWW 2018).

Parity with model/general_recommender/MultiVAE.py:15-204:

* q-net: l2-normalized dropout(0.8-keep) input row -> dense stack whose last
  layer emits [mu; logvar] (MultiVAE.py:74-92);
* z = mu + is_training * eps * std with eps ~ N(0, 0.01) — the reference's
  (unusually small) noise stddev is mirrored (MultiVAE.py:106-109);
* p-net -> logits -> log-softmax; neg-ELBO = multinomial NLL + anneal * KL
  + 2 * l2_regularizer(reg)(weights) (MultiVAE.py:115-125);
* KL annealing: anneal = min(anneal_cap, step / total_anneal_steps) with a
  global step counter (MultiVAE.py:154-157) — the trainer threads ``step``
  through the scanned epoch.

TPU-first: the reference predicts ONE USER AT A TIME with a host-built
dense row (MultiVAE.py:184-204); here eval rows are scattered on device and
the whole test batch is decoded in one forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.ops.activations import activation_function
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.ae_common import DenseRowMixin
from neurec_tpu.ops.initializers import get_initializer


_activation = activation_function


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


@register("MultiVAE")
class MultiVAE(DenseRowMixin, Recommender):
    data_kind = "dense_row"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.act = _activation(config.get("activation", "tanh"))
        self.reg = float(config.get("reg", 0.0))
        self.anneal_cap = float(config.get("anneal_cap", 0.2))
        self.total_anneal_steps = int(config.get("total_anneal_steps", 2000))
        self.weight_init_method = config.get("weight_init_method", "xavier_normal")
        self.bias_init_method = config.get("bias_init_method", "tnormal")
        self.stddev = float(config.get("stddev", 0.01))
        self.keep_prob = float(config.get("keep_prob", 0.8))
        p_dim = list(config.get("p_dim", [16, 32]))
        self.p_dims = p_dim + [self.num_items]
        self.q_dims = self.p_dims[::-1]
        self._setup_rows(dataset)

    def init_params(self, rng):
        w_init = get_initializer(self.weight_init_method, self.stddev)
        b_init = get_initializer(self.bias_init_method, self.stddev)
        params = {"q_w": [], "q_b": [], "p_w": [], "p_b": []}
        for i, (d_in, d_out) in enumerate(zip(self.q_dims[:-1], self.q_dims[1:])):
            if i == len(self.q_dims) - 2:
                d_out *= 2  # [mu; logvar]
            rng, k1, k2 = jax.random.split(rng, 3)
            params["q_w"].append(w_init(k1, (d_in, d_out)))
            params["q_b"].append(b_init(k2, (d_out,)))
        for d_in, d_out in zip(self.p_dims[:-1], self.p_dims[1:]):
            rng, k1, k2 = jax.random.split(rng, 3)
            params["p_w"].append(w_init(k1, (d_in, d_out)))
            params["p_b"].append(b_init(k2, (d_out,)))
        return params

    def _q_net(self, params, rows, rng, training):
        h = _l2_normalize(rows, axis=1)
        if training:
            keep = self.keep_prob
            mask = jax.random.bernoulli(rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        n = len(params["q_w"])
        mu = logvar = None
        for i, (w, b) in enumerate(zip(params["q_w"], params["q_b"])):
            h = h @ w + b
            if i != n - 1:
                h = self.act(h)
            else:
                d = self.q_dims[-1]
                mu, logvar = h[:, :d], h[:, d:]
        return mu, logvar

    def _p_net(self, params, z):
        n = len(params["p_w"])
        h = z
        for i, (w, b) in enumerate(zip(params["p_w"], params["p_b"])):
            h = h @ w + b
            if i != n - 1:
                h = self.act(h)
        return h

    def loss(self, params, batch, weights):
        rows = batch["rows"]
        k_drop, k_eps = jax.random.split(batch["rng"])
        mu, logvar = self._q_net(params, rows, k_drop, training=True)
        std = jnp.exp(0.5 * logvar)
        eps = 0.01 * jax.random.normal(k_eps, std.shape)
        z = mu + eps * std
        logits = self._p_net(params, z)
        log_softmax = jax.nn.log_softmax(logits, axis=-1)

        w = weights
        denom = jnp.maximum(jnp.sum(w), 1.0)
        neg_ll = -jnp.sum(jnp.sum(log_softmax * rows, axis=1) * w) / denom
        kl_per_user = jnp.sum(
            0.5 * (-logvar + jnp.exp(logvar) + jnp.square(mu) - 1.0), axis=1
        )
        kl = jnp.sum(kl_per_user * w) / denom

        step = batch["step"].astype(jnp.float32)
        if self.total_anneal_steps > 0:
            anneal = jnp.minimum(self.anneal_cap, step / self.total_anneal_steps)
        else:
            anneal = self.anneal_cap
        reg_var = self.reg * 0.5 * sum(
            jnp.sum(jnp.square(p)) for p in params["q_w"] + params["p_w"]
        )
        return neg_ll + anneal * kl + 2.0 * reg_var

    def predict(self, params, users):
        rows = self.make_rows(users)
        mu, _ = self._q_net(params, rows, None, training=False)
        return self._p_net(params, mu)

    def eval_embeddings(self, params, users):
        # the decoder's last layer is linear over items: factor it out
        rows = self.make_rows(users)
        h, _ = self._q_net(params, rows, None, training=False)
        for w, b in zip(params["p_w"][:-1], params["p_b"][:-1]):
            h = self.act(h @ w + b)
        return self._affine_eval(h, params["p_w"][-1].T, params["p_b"][-1])
