"""Parameter initializer registry.

Parity with util/tool.py:79-97 (``get_initializer``): schemes tnormal
(truncated normal), uniform, normal, xavier_normal, xavier_uniform,
he_normal, he_uniform, zeros, ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_initializer(init_method: str, stddev: float = 0.01):
    """Return ``init(key, shape, dtype) -> array`` for the named scheme."""
    m = init_method.lower()
    if m == "tnormal":
        def init(key, shape, dtype=jnp.float32):
            return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    elif m == "uniform":
        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, minval=-stddev, maxval=stddev
            )
    elif m == "normal":
        def init(key, shape, dtype=jnp.float32):
            return stddev * jax.random.normal(key, shape, dtype)
    elif m in ("xavier_normal", "xavier_uniform", "he_normal", "he_uniform"):
        base = {
            "xavier_normal": jax.nn.initializers.glorot_normal,
            "xavier_uniform": jax.nn.initializers.glorot_uniform,
            "he_normal": jax.nn.initializers.he_normal,
            "he_uniform": jax.nn.initializers.he_uniform,
        }[m]()

        def init(key, shape, dtype=jnp.float32):
            # variance-scaling inits need >= 2 dims. TF initializes 1-D
            # biases with fan_in = fan_out = shape[-1]
            # (tf.contrib.layers variance_scaling `_compute_fans`); the
            # old (1, n) promotion gave fan_in = 1 — a sqrt(n)-too-large
            # init (~50x at 5k dims; review r5). Reproduce the TF fans
            # with jax's own distribution family (variance-corrected
            # truncated normal / uniform).
            if len(shape) < 2:
                n = shape[0] if shape else 1
                scale = 2.0 if m.startswith("he") else 1.0
                var = scale / max(float(n), 1.0)  # FAN_IN == FAN_AVG here
                if m.endswith("uniform"):
                    limit = jnp.sqrt(3.0 * var)
                    return jax.random.uniform(
                        key, shape, dtype, minval=-limit, maxval=limit
                    )
                # jax variance_scaling's truncated-normal correction
                std = jnp.sqrt(var) / jnp.asarray(
                    0.87962566103423978, dtype
                )
                return std * jax.random.truncated_normal(
                    key, -2.0, 2.0, shape, dtype
                )
            return base(key, shape, dtype)
    elif m == "zeros":
        def init(key, shape, dtype=jnp.float32):
            return jnp.zeros(shape, dtype)
    elif m == "ones":
        def init(key, shape, dtype=jnp.float32):
            return jnp.ones(shape, dtype)
    else:
        raise ValueError("unknown init method '%s'" % init_method)
    return init
