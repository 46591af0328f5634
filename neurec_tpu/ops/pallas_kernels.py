"""Pallas TPU kernels for the evaluation hot path.

``masked_scores``: fused full-catalog scoring + train-item masking for the
ranking evaluator. The XLA formulation materializes the raw score matrix,
concatenates a dump column, scatters -inf at train items and slices — four
HBM round-trips over a (B, num_items) buffer. This kernel streams item
blocks through VMEM: one MXU matmul per block with the membership mask
applied in-registers, writing the masked scores exactly once.

Mosaic constraints shape the membership test: lane-dimension loads must be
128-aligned, and 3-D broadcast compares blow vector registers, so the
kernel walks each user's padded train row in 128-wide lane chunks and
statically unrolls a (B, 1) x (1, BI) compare per train-item slot — every
intermediate stays 2-D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_LANE = 128


def _masked_scores_kernel(u_ref, items_ref, rows_ref, out_ref, *, block_items):
    j = pl.program_id(0)
    scores = jnp.dot(
        u_ref[:], items_ref[:].T, preferred_element_type=jnp.float32
    )                                                     # (B, BI) on the MXU
    ids = j * block_items + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_items), 1
    )                                                     # (1, BI)
    B, L = rows_ref.shape

    # fully static unroll: Mosaic cannot legalize an scf.for carrying the
    # (B, BI) mask vector, and L is a trace-time constant anyway
    member = jnp.zeros((B, block_items), jnp.bool_)
    for c in range(L // _LANE):
        chunk = rows_ref[:, c * _LANE : (c + 1) * _LANE]  # (B, 128)
        for k in range(_LANE):                            # 2-D compares only
            member = member | (chunk[:, k : k + 1] == ids)
    out_ref[:] = jnp.where(member, _NEG_INF, scores)


@functools.partial(jax.jit, static_argnames=("block_items", "interpret"))
def masked_scores(
    u_emb: jnp.ndarray,      # (B, d) float32 user representations
    item_emb: jnp.ndarray,   # (I, d) float32 item table
    train_rows: jnp.ndarray,  # (B, L) int32 padded train items (pad >= I)
    block_items: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, I) scores with each user's train items set to -inf."""
    B, d = u_emb.shape
    I = item_emb.shape[0]
    L = train_rows.shape[1]

    i_pad = (-I) % block_items
    if i_pad:
        item_emb = jnp.pad(item_emb, ((0, i_pad), (0, 0)))
    l_pad = (-L) % _LANE
    if l_pad:
        # pad value beyond any (padded) item id so it never matches
        train_rows = jnp.pad(
            train_rows, ((0, 0), (0, l_pad)), constant_values=I + i_pad
        )
    n_blocks = (I + i_pad) // block_items

    out = pl.pallas_call(
        functools.partial(_masked_scores_kernel, block_items=block_items),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_items, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, L + l_pad), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, block_items), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, I + i_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        u_emb.astype(jnp.float32),
        item_emb.astype(jnp.float32),
        train_rows.astype(jnp.int32),
    )
    return out[:, :I]
