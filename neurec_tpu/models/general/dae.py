"""DAE — denoising autoencoder over dense user rows.

Parity with model/general_recommender/DAE.py: input row multiplied by a
Bernoulli(1-corruption_level) mask, one hidden layer
``h = h_act(x @ We + be)``, decoder ``y = g_act(h @ Wd + bd)``, full-row
binary cross-entropy summed over all entries + reg * l2(weights, biases)
(DAE.py:52-70). The reference draws ONE corruption mask per epoch for the
whole matrix (DAE.py:88); here a fresh mask is drawn per batch — same
distribution, stream-friendly. With g_act == sigmoid the BCE is computed
from logits for stability.

The reference also allocates a per-user embedding ``V`` it never uses in
inference (DAE.py:45); omitted here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.ae_common import DenseRowMixin
from neurec_tpu.models.general.multivae import _activation
from neurec_tpu.ops.initializers import get_initializer


@register("DAE")
class DAE(DenseRowMixin, Recommender):
    data_kind = "dense_row"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.hidden_neuron = int(config.get("hidden_neuron", 100))
        self.h_act_name = config.get("h_act", "sigmoid")
        self.g_act_name = config.get("g_act", "sigmoid")
        self.h_act = _activation(self.h_act_name)
        self.reg = float(config.get("reg", 0.0))
        self.corruption_level = float(config.get("corruption_level", 0.0))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self._setup_rows(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {
            "w_enc": init(k1, (self.num_items, self.hidden_neuron)),
            "b_enc": init(k2, (self.hidden_neuron,)),
            "w_dec": init(k3, (self.hidden_neuron, self.num_items)),
            "b_dec": init(k4, (self.num_items,)),
        }

    def _decode_logits(self, params, corrupted_rows):
        h = self.h_act(corrupted_rows @ params["w_enc"] + params["b_enc"])
        return h @ params["w_dec"] + params["b_dec"]

    def loss(self, params, batch, weights):
        rows = batch["rows"]
        if self.corruption_level > 0:
            mask = jax.random.bernoulli(
                batch["rng"], 1.0 - self.corruption_level, rows.shape
            ).astype(jnp.float32)
            corrupted = rows * mask
        else:
            corrupted = rows
        logits = self._decode_logits(params, corrupted)
        if self.g_act_name == "sigmoid":
            ce = (
                jnp.maximum(logits, 0.0)
                - logits * rows
                + jax.nn.softplus(-jnp.abs(logits))
            )
        else:
            y = jnp.clip(_activation(self.g_act_name)(logits), 1e-7, 1 - 1e-7)
            ce = -(rows * jnp.log(y) + (1 - rows) * jnp.log(1 - y))
        loss = jnp.sum(jnp.sum(ce, axis=1) * weights)
        reg = self.reg * 0.5 * (
            jnp.sum(jnp.square(params["w_enc"]))
            + jnp.sum(jnp.square(params["w_dec"]))
            + jnp.sum(jnp.square(params["b_enc"]))
            + jnp.sum(jnp.square(params["b_dec"]))
        )
        return loss + reg

    def predict(self, params, users):
        rows = self.make_rows(users)
        logits = self._decode_logits(params, rows)
        return _activation(self.g_act_name)(logits)
