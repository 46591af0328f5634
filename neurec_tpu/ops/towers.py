"""Dense MLP towers: explicit init/apply pairs used by NeuMF, MLP, DMF, DeepICF.

Replaces the reference's implicit ``tf.layers.dense`` stacks
(e.g. NeuMF.py:81-82, MLP.py:54-66) with functional param pytrees.
TF's dense layer default-initializes kernels with glorot_uniform and biases
with zeros; we mirror that.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_dense_stack(
    rng: jax.Array,
    in_dim: int,
    units: Sequence[int],
) -> List[dict]:
    """Initialize a stack of dense layers: [{'w': (d_in, d_out), 'b': (d_out,)}]."""
    glorot = jax.nn.initializers.glorot_uniform()
    params = []
    d = in_dim
    for n in units:
        rng, sub = jax.random.split(rng)
        params.append({"w": glorot(sub, (d, n)), "b": jnp.zeros((n,))})
        d = n
    return params


def apply_dense_stack(
    params: List[dict],
    x: jnp.ndarray,
    activation: Callable = jax.nn.relu,
    final_activation: Optional[Callable] = "same",
) -> jnp.ndarray:
    """Apply the stack; ``final_activation`` defaults to the same activation
    (TF's per-layer activation semantics), pass None for a linear last layer."""
    n = len(params)
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < n - 1:
            x = activation(x)
        else:
            if final_activation == "same":
                x = activation(x)
            elif final_activation is not None:
                x = final_activation(x)
    return x
