"""Transformer primitives matching the reference SASRec block semantics
(model/sequential_recommender/SASRec.py:132-266 — Kang & McAuley's code):

* pre-LN with the residual adding the NORMALIZED input (a known quirk of
  the original implementation, mirrored deliberately);
* causal multi-head attention with key/query padding masks;
* position-wise FFN as two kernel-size-1 convs (== dense layers).

All ops are batched (B, T, d) and shaped statically for XLA: the causal
(T, T) mask is a compile-time constant and the whole block is one fused
attention matmul chain on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -(2.0 ** 32) + 1.0


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return params["gamma"] * (x - mean) * jax.lax.rsqrt(var + eps) + params["beta"]


def init_layer_norm(dim: int) -> dict:
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def init_dense(rng, d_in: int, d_out: int) -> dict:
    w = jax.nn.initializers.glorot_uniform()(rng, (d_in, d_out))
    return {"w": w, "b": jnp.zeros((d_out,))}


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def _dropout(rng, x, rate, training):
    if not training or rng is None or rate <= 0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def multihead_attention(
    params: dict,          # {'q','k','v': dense params}
    queries: jnp.ndarray,  # (B, T, d) — already normalized by the caller
    keys: jnp.ndarray,     # (B, T, d) — raw (un-normalized) sequence
    valid: jnp.ndarray,    # (B, T) float — 1 for real positions
    num_heads: int,
    causal: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
    training: bool = False,
) -> jnp.ndarray:
    B, T, d = queries.shape
    dh = d // num_heads
    q = dense(params["q"], queries).reshape(B, T, num_heads, dh)
    k = dense(params["k"], keys).reshape(B, T, num_heads, dh)
    v = dense(params["v"], keys).reshape(B, T, num_heads, dh)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (dh ** 0.5)
    key_mask = valid[:, None, None, :]                     # (B,1,1,T)
    logits = jnp.where(key_mask > 0, logits, _NEG)
    if causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(tri[None, None], logits, _NEG)
    att = jax.nn.softmax(logits, axis=-1)
    att = att * valid[:, None, :, None]                    # query masking
    att = _dropout(rng, att, dropout_rate, training)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, d)
    return out + queries                                   # residual (pre-LN'd q)


def feedforward(
    params: dict,          # {'w1','w2': dense params}
    x: jnp.ndarray,        # (B, T, d) — already normalized by the caller
    dropout_rate: float = 0.0,
    rng=None,
    training: bool = False,
) -> jnp.ndarray:
    r1, r2 = (None, None) if rng is None else jax.random.split(rng)
    h = jax.nn.relu(dense(params["w1"], x))
    h = _dropout(r1, h, dropout_rate, training)
    h = dense(params["w2"], h)
    h = _dropout(r2, h, dropout_rate, training)
    return h + x
