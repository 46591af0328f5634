"""Loss functions with the reference's reduction semantics.

Parity notes (util/learner.py:19-41, util/tool.py:216-224):

* ``pairwise_loss('bpr', y)``    = -sum(log sigmoid(y))       [sum, not mean]
* ``pairwise_loss('hinge', y)``  = sum(max(y + margin, 0))
* ``pairwise_loss('square', y)`` = sum((1 - y)^2)
* ``pointwise_loss('cross_entropy', labels, logits)`` mirrors
  ``tf.losses.sigmoid_cross_entropy`` (mean over elements).
* ``pointwise_loss('square', labels, preds)`` = sum((labels - preds)^2)
* ``l2_loss(*xs)`` = sum of 0.5 * sum(x^2) (tf.nn.l2_loss semantics).

All functions accept an optional ``weights`` array for masked/padded batches
(weight 0 drops the example); the reference has no padding so weights=None
reproduces it exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _weighted_sum(x: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is not None:
        x = x * weights
    return jnp.sum(x)


def pairwise_loss(
    loss_function: str,
    y: jnp.ndarray,
    margin: float = 1.0,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    lf = loss_function.lower()
    if lf == "bpr":
        # -log sigmoid(y) == softplus(-y), numerically stable
        return _weighted_sum(jax.nn.softplus(-y), weights)
    elif lf == "hinge":
        return _weighted_sum(jnp.maximum(y + margin, 0.0), weights)
    elif lf == "square":
        return _weighted_sum(jnp.square(1.0 - y), weights)
    raise ValueError("unknown pairwise loss '%s'" % loss_function)


def pointwise_loss(
    loss_function: str,
    labels: jnp.ndarray,
    preds: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    lf = loss_function.lower()
    if lf == "cross_entropy":
        # tf.losses.sigmoid_cross_entropy: mean of per-element sigmoid CE
        # (reduction SUM_BY_NONZERO_WEIGHTS == mean for unit weights).
        ce = jnp.maximum(preds, 0.0) - preds * labels + jax.nn.softplus(-jnp.abs(preds))
        if weights is not None:
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            return jnp.sum(ce * weights) / denom
        return jnp.mean(ce)
    elif lf == "square":
        return _weighted_sum(jnp.square(labels - preds), weights)
    raise ValueError("unknown pointwise loss '%s'" % loss_function)


def l2_loss(*params: jnp.ndarray) -> jnp.ndarray:
    """sum_i 0.5 * ||p_i||^2 — tf.nn.l2_loss summed (util/tool.py:216-217)."""
    return sum(0.5 * jnp.sum(jnp.square(p)) for p in params)


def log_loss(y: jnp.ndarray) -> jnp.ndarray:
    """BPR per-element loss -log sigmoid(y) (util/tool.py:220-224)."""
    return jax.nn.softplus(-y)
