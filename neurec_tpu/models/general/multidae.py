"""MultiDAE — denoising autoencoder with multinomial likelihood.

Parity with model/general_recommender/MultiDAE.py: l2-normalized dropout
input -> dense stack (activation on all but the last layer) -> log-softmax;
loss = -mean(sum(log_softmax * row)) + 2 * l2_regularizer(reg)(weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.ae_common import DenseRowMixin
from neurec_tpu.models.general.multivae import _activation, _l2_normalize
from neurec_tpu.ops.initializers import get_initializer


@register("MultiDAE")
class MultiDAE(DenseRowMixin, Recommender):
    data_kind = "dense_row"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.act = _activation(config.get("activation", "tanh"))
        self.reg = float(config.get("reg", 0.0))
        self.weight_init_method = config.get("weight_init_method", "xavier_normal")
        self.bias_init_method = config.get("bias_init_method", "tnormal")
        self.stddev = float(config.get("stddev", 0.01))
        self.keep_prob = float(config.get("keep_prob", 0.8))
        p_dim = list(config.get("p_dim", [16, 32]))
        # encoder mirrors the decoder dims (MultiDAE.py dims construction)
        p_dims = p_dim + [self.num_items]
        self.dims = p_dims[::-1] + p_dims[1:]
        self._setup_rows(dataset)

    def init_params(self, rng):
        w_init = get_initializer(self.weight_init_method, self.stddev)
        b_init = get_initializer(self.bias_init_method, self.stddev)
        params = {"w": [], "b": []}
        for d_in, d_out in zip(self.dims[:-1], self.dims[1:]):
            rng, k1, k2 = jax.random.split(rng, 3)
            params["w"].append(w_init(k1, (d_in, d_out)))
            params["b"].append(b_init(k2, (d_out,)))
        return params

    def _forward(self, params, rows, rng, training):
        h = _l2_normalize(rows, axis=1)
        if training:
            keep = self.keep_prob
            mask = jax.random.bernoulli(rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        n = len(params["w"])
        for i, (w, b) in enumerate(zip(params["w"], params["b"])):
            h = h @ w + b
            if i != n - 1:
                h = self.act(h)
        return h

    def loss(self, params, batch, weights):
        rows = batch["rows"]
        logits = self._forward(params, rows, batch["rng"], training=True)
        log_softmax = jax.nn.log_softmax(logits, axis=-1)
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        neg_ll = -jnp.sum(jnp.sum(log_softmax * rows, axis=1) * weights) / denom
        reg_var = self.reg * 0.5 * sum(jnp.sum(jnp.square(w)) for w in params["w"])
        return neg_ll + 2.0 * reg_var

    def predict(self, params, users):
        rows = self.make_rows(users)
        return self._forward(params, rows, None, training=False)

    def eval_embeddings(self, params, users):
        # last layer is linear over items: factor it out
        h = _l2_normalize(self.make_rows(users), axis=1)
        for w, b in zip(params["w"][:-1], params["b"][:-1]):
            h = self.act(h @ w + b)
        return self._affine_eval(h, params["w"][-1].T, params["b"][-1])
