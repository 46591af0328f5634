"""Multi-host initialization.

The reference is single-process (SURVEY.md §2.6). For pod slices spanning
hosts, JAX's distributed runtime must be initialized before any device use;
after that, ``make_mesh`` over ``jax.devices()`` spans the whole slice and
the NamedSharding'd train steps communicate over ICI/DCN via the
XLA-inserted collectives — no framework-level wire protocol exists or is
needed.
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed (no-op if already initialized or if the
    environment provides the standard TPU pod metadata automatically).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0
