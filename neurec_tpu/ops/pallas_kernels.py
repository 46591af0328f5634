"""Pallas TPU kernels for the evaluation hot path.

``masked_scores``: fused full-catalog scoring + train-item masking for the
ranking evaluator. The naive XLA formulation materializes the raw score
matrix, concatenates a dump column, scatters -inf at train items and
slices — four HBM round-trips over a (B, num_items) float buffer. Here the
padded train rows are first expanded into a (B, num_items) *int8* membership
mask by one cheap XLA scatter (25x less traffic than a float round-trip at
d=64-class embedding widths), and the kernel then streams item blocks
through VMEM: one MXU matmul per block with the mask applied in-registers,
writing the masked scores exactly once.

Design note: a previous revision tested membership inside the kernel by
statically unrolling one (B, 1) x (1, BI) compare per padded train slot.
That makes compile time and register pressure linear in the longest train
row — at gowalla scale (L=241, B=1024) Mosaic spilled 125MB of vregs and
the compile died with a VMEM OOM. The int8-mask design is O(1) in L: the
scatter runs in plain XLA where long rows are cheap, and the kernel's
footprint per block is (B, BI) bytes regardless of row length.

The kernel keeps every operand local, so under a multi-chip mesh it shards
with ``shard_map`` over the batch ('data') axis — see
``neurec_tpu/eval/evaluator.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_LANE = 128


def _masked_scores_kernel(u_ref, items_ref, mask_ref, out_ref):
    scores = jnp.dot(
        u_ref[:], items_ref[:].T, preferred_element_type=jnp.float32
    )                                                     # (B, BI) on the MXU
    out_ref[:] = jnp.where(mask_ref[:] != 0, _NEG_INF, scores)


def build_train_mask(train_rows: jnp.ndarray, num_items: int) -> jnp.ndarray:
    """(B, num_items) int8 membership mask from padded train rows.

    ``train_rows`` may contain pad values anywhere in [num_items, 2^31);
    out-of-range ids are dropped by the scatter.
    """
    B = train_rows.shape[0]
    mask = jnp.zeros((B, num_items), jnp.int8)
    return mask.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], train_rows
    ].set(1, mode="drop")


def pack_train_bits(
    train_rows: jnp.ndarray, num_items: int, block_items: int = 1024
) -> jnp.ndarray:
    """(B, I_p/8) uint8 bit-plane-packed train mask for the eval bits path.

    The eval users' train masks are static across eval calls, so the
    evaluator packs them ONCE (8x smaller than the int8 mask it would
    otherwise scatter-build every call). Packing is per item block of
    P = block_items items: within block ``blk``, item ``c*(P/8) + j``
    lives in byte ``blk*(P/8) + j`` bit ``c``. With ONE global block
    (block_items = num_items rounded to 8 — the evaluator's choice) the
    expansion is ``((bits[:, None, :] >> plane) & 1).reshape(B, I)``,
    which XLA fuses into the score matmul's epilogue
    (eval/evaluator.py use_bits path; benchmarks/eval_attrib3.json).
    """
    i_pad = (-num_items) % block_items
    I_p = num_items + i_pad
    mask = build_train_mask(train_rows, I_p)  # (B, I_p) int8
    return pack_mask_bits(mask, block_items)


def pack_mask_bits(mask: jnp.ndarray, block_items: int) -> jnp.ndarray:
    """(B, I_p) 0/1 mask -> (B, I_p/8) uint8 bit-plane bytes.

    Same layout as :func:`pack_train_bits` (I_p must be a multiple of
    ``block_items``); split out so callers that already hold a membership
    mask — e.g. the evaluator's streamed edge-list tier — can pack
    without a padded-rows detour.
    """
    B, I_p = mask.shape
    m4 = mask.reshape(B, I_p // block_items, 8, block_items // 8)
    # all-uint8 arithmetic: each byte sums 8 disjoint weights (max 255),
    # so a uint8 accumulator is exact and the (B, I_p) transient stays
    # 1 byte/element — an int32 upcast would 4x the biggest buffer of
    # the streamed tiers (review r5 finding)
    weights = (
        jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)
    )[None, None, :, None]
    bits = jnp.sum(
        m4.astype(jnp.uint8) * weights, axis=2, dtype=jnp.uint8
    )
    return bits.reshape(B, I_p // 8)


def masked_scores(
    u_emb: jnp.ndarray,      # (B, d) float32 user representations
    item_emb: jnp.ndarray,   # (I, d) float32 item table
    train_rows: jnp.ndarray,  # (B, L) int32 padded train items (pad >= I)
    block_items: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, I) scores with each user's train items set to -inf.

    Plain traceable function — callers jit it (wrapping it in its own
    jax.jit would add a nested pjit boundary inside the evaluator's scan).
    """
    B, d = u_emb.shape
    I = item_emb.shape[0]

    i_pad = (-I) % block_items
    if i_pad:
        item_emb = jnp.pad(item_emb, ((0, i_pad), (0, 0)))
    n_blocks = (I + i_pad) // block_items
    # pad ids (>= I) land in the pad columns and are sliced off below
    mask = build_train_mask(train_rows, I + i_pad)

    out = pl.pallas_call(
        _masked_scores_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_items, d), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, block_items), lambda j: (0, j), memory_space=pltpu.VMEM
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
        mask,
    )
    return out[:, :I]
