"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md §2.6). The TPU design scales via a
2-D ``('data', 'model')`` mesh:

* batches are sharded over 'data' (data parallelism — gradient psum inserted
  by XLA);
* user/item embedding tables are row-sharded over 'model' (tensor
  parallelism — XLA turns table lookups into ID-partitioned gather exchanges
  and the full-catalog scoring matmul into a column-sharded matmul);
* everything else is replicated.

The same jitted code runs unmodified on one chip (mesh of size 1) or a pod
slice; collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            "mesh %dx%d does not cover %d devices" % (n_data, n_model, len(devices))
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard dim 0 over 'model' — embedding tables."""
    return NamedSharding(mesh, P(*(("model",) + (None,) * (ndim - 1))))


def col_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard last dim over 'model' — output projections."""
    return NamedSharding(mesh, P(*((None,) * (ndim - 1) + ("model",))))


def global_device_put(x, sharding: NamedSharding):
    """Place host data onto a (possibly multi-host) sharding.

    Single-process: plain ``device_put``. Multi-process: ``device_put``
    cannot target non-addressable devices, so the global array is assembled
    from each process's addressable shards via ``make_array_from_callback``.
    This relies on the framework's multi-host data model: every process
    holds the full host value (datasets, batch index blocks, and seeded
    parameter initializations are process-replicated by construction), and
    each process contributes only the slices its local devices own.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_params(params, shardings):
    """Place a param pytree onto the mesh.

    ``shardings`` is either None (leave placement unchanged) or a pytree of
    NamedSharding matching ``params``' structure exactly. Works under
    multi-host meshes (see ``global_device_put``).
    """
    if shardings is None:
        return params
    return jax.tree.map(global_device_put, params, shardings)
