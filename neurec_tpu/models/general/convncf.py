"""ConvNCF — outer-product CNN collaborative filtering (He et al., IJCAI 2018).

Parity with model/general_recommender/ConvNCF.py:45-150:

* interaction map = outer(p_u, q_i) as a (d, d) image, passed through a
  stack of stride-2 2x2 'SAME' tanh convs (net_channel) down to (1, 1),
  then dropout + a scalar dense head;
* BPR pairwise loss; regs split: lambda(embeddings of the batch),
  gamma(W, b), lambda_weight(all conv kernels + W, b);
* two Adagrad optimizers — lr_embed for the embedding tables, lr_net for
  the conv/dense parameters (ConvNCF.py:138-150) — realised with
  optax.multi_transform over param labels;
* optional embedding warm-start from ``mf_pretrain``/``mlp_pretrain``
  pickles (ConvNCF.py:148-163). Deviation: the reference assigns the whole
  first pickle to P and the whole second to Q (`_create_variables`,
  ConvNCF.py:73-76), which only works when each file holds a single array;
  here a ``[P, Q]`` pair in ``mf_pretrain`` (the NeuMF/`pretrain.py` layout)
  is also accepted. The reference's `_create_pre_optimizer` (ConvNCF.py:129)
  is dead code — never run by train_model — and is not reproduced.

Full-catalog predict runs the CNN over every (user, item) pair, chunked
over items (the reference feeds per-user full-item batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss
from neurec_tpu.pretrain import try_load

_PREDICT_CHUNK = 256


@register("ConvNCF")
class ConvNCF(Recommender):
    data_kind = "pairwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        regs = config.get("regs", [0.01, 0, 0])
        self.lambda_bilinear = float(regs[0])
        self.gamma_bilinear = float(regs[1])
        self.lambda_weight = float(regs[2])
        self.nc = list(config.get("net_channel", [32, 32, 32, 32, 32, 32]))
        self.lr_embed = float(config.get("lr_embed", 0.05))
        self.lr_net = float(config.get("lr_net", 0.05))
        self.keep = float(config.get("keep", 1.0))
        self.loss_function = config.get("loss_function", "BPR")
        self.embed_init_method = config.get("embed_init_method", "tnormal")
        self.weight_init_method = config.get("weight_init_method", "xavier_normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.mf_pretrain = config.get("mf_pretrain", "")
        self.mlp_pretrain = config.get("mlp_pretrain", "")
        if 2 ** len(self.nc) != self.embedding_size:
            raise ValueError(
                "ConvNCF needs len(net_channel) stride-2 convs to reduce the "
                "(%d, %d) map to 1x1 — got %d layers"
                % (self.embedding_size, self.embedding_size, len(self.nc))
            )

    def make_optimizer(self):
        def label_fn(params):
            return {
                k: ("embed" if k in ("embedding_P", "embedding_Q") else "net")
                for k in params
            }

        return optax.multi_transform(
            {
                "embed": optax.adagrad(self.lr_embed, initial_accumulator_value=0.1),
                "net": optax.adagrad(self.lr_net, initial_accumulator_value=0.1),
            },
            label_fn,
        )

    def init_params(self, rng):
        e_init = get_initializer(self.embed_init_method, self.stddev)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        rng, ku, ki, kw = jax.random.split(rng, 4)
        params = {
            "embedding_P": e_init(ku, (self.num_users, self.embedding_size)),
            "embedding_Q": e_init(ki, (self.num_items, self.embedding_size)),
            "conv": [],
            "W": w_init(kw, (self.nc[-1], 1)),
            "b": jnp.full((1,), 0.0),
        }
        rng, kb = jax.random.split(rng)
        params["b"] = w_init(kb, (1,))
        iszs = [1] + self.nc[:-1]
        for isz, osz in zip(iszs, self.nc):
            rng, k = jax.random.split(rng)
            params["conv"].append(
                {"w": w_init(k, (2, 2, isz, osz)), "b": jnp.full((osz,), 0.1)}
            )
        return self._try_warm_start(params)

    def _try_warm_start(self, params):
        """Warm-start P/Q from pretrain pickles (ConvNCF.py:148-163)."""
        loaded = try_load(self.mf_pretrain)
        if loaded is None:
            return params
        first = loaded[0]
        if isinstance(first, (list, tuple)) and len(first) >= 2:
            p, q = first[0], first[1]              # [P, Q] single-file layout
        else:
            second = try_load(self.mlp_pretrain)
            if second is None:
                return params
            p, q = first, second[0]
        params["embedding_P"] = jnp.asarray(p)
        params["embedding_Q"] = jnp.asarray(q)
        return params

    def _cnn(self, params, images, rng=None, training=False):
        """(N, d, d, 1) outer-product maps -> (N,) scores."""
        x = images
        for layer in params["conv"]:
            x = jax.lax.conv_general_dilated(
                x,
                layer["w"],
                window_strides=(2, 2),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jnp.tanh(x + layer["b"])
        x = x.reshape(x.shape[0], self.nc[-1])
        if training and rng is not None and self.keep < 1.0:
            mask = jax.random.bernoulli(rng, self.keep, x.shape)
            x = jnp.where(mask, x / self.keep, 0.0)
        return (x @ params["W"] + params["b"])[:, 0]

    def _pair_scores(self, params, users, items, rng=None, training=False):
        p = params["embedding_P"][users]
        q = params["embedding_Q"][items]
        images = (p[:, :, None] * q[:, None, :])[..., None]
        return self._cnn(params, images, rng, training), p, q

    def loss(self, params, batch, weights):
        users = batch["users"]
        k1, k2 = jax.random.split(batch["rng"])
        y_pos, p, q1 = self._pair_scores(
            params, users, batch["pos_items"], k1, training=True
        )
        y_neg, _, q2 = self._pair_scores(
            params, users, batch["neg_items"], k2, training=True
        )
        w = weights[:, None]
        conv_reg = sum(l2_loss(c["w"], c["b"]) for c in params["conv"])
        head_reg = l2_loss(params["W"], params["b"])
        return pairwise_loss(
            self.loss_function, y_pos - y_neg, weights=weights
        ) + self.lambda_bilinear * l2_loss(p * w, q2 * w, q1 * w) + (
            self.gamma_bilinear * head_reg
        ) + self.lambda_weight * (conv_reg + head_reg)

    def predict(self, params, users):
        B = users.shape[0]
        p = params["embedding_P"][users]
        num_items = self.num_items
        chunk = min(_PREDICT_CHUNK, num_items)
        n_chunks = -(-num_items // chunk)
        padded = n_chunks * chunk
        Q = params["embedding_Q"]
        if padded != num_items:
            Q = jnp.pad(Q, ((0, padded - num_items), (0, 0)))
        Q = Q.reshape(n_chunks, chunk, -1)

        def score_chunk(carry, q):
            images = (p[:, None, :, None] * q[None, :, None, :])[..., None]
            images = images.reshape(
                B * chunk, self.embedding_size, self.embedding_size, 1
            )
            scores = self._cnn(params, images).reshape(B, chunk)
            return carry, scores

        _, chunks = jax.lax.scan(score_chunk, 0, Q)
        return jnp.moveaxis(chunks, 0, 1).reshape(B, padded)[:, :num_items]
