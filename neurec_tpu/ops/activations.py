"""Activation registry — parity with util/tool.py:10-34 (7 named
activations resolved by string). The reference applies the activation
eagerly to a tensor; here the name resolves to a jax function once at
model-construction time. `softplus` is an addition used by some configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "softmax": jax.nn.softmax,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
}


def activation_function(name: str):
    """Resolve an activation by name (case-insensitive)."""
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise NotImplementedError(
            "unknown activation %r (have: %s)"
            % (name, ", ".join(sorted(_ACTIVATIONS)))
        ) from None
