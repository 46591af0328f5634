"""Pallas TPU kernel for the large-graph SpMM scatter (COO segment-sum).

Replaces ``jax.ops.segment_sum`` in ``ops/graph.py::spmm`` — the hot op of
LightGCN/NGCF propagation at gowalla scale and the reference pain point the
graph models exist to kill (reference: NGCF.py:320-332 100-fold host SpMM,
LightGCN.py:132-149 ``sparse_tensor_dense_matmul``). Measured on the
north-star graph (68,404 nodes, 348k edges, d=64) the XLA scatter-add costs
4.0 ms/call and dominates the 31 ms LightGCN train step
(benchmarks/spmm_micro.py).

TPU design — scatters don't vectorize, matmuls do:

* Host-side, once: edges are partitioned by destination-row tile
  (``tile_r`` rows per tile), each tile's edge list is padded to a multiple
  of ``chunk`` (zero ``vals`` padding) and, inside a tile, sorted by source
  column so the XLA gather that feeds the kernel walks HBM near-
  sequentially instead of randomly (the gather is the other half of the
  cost: 1.9 ms measured for the random order).
* The kernel runs one grid step per chunk. It builds a one-hot-times-vals
  selector S (tile_r, chunk) in registers — ``S[r, e] = vals[e] if
  rows[e] == r`` — and accumulates ``S @ gathered_chunk`` into the output
  tile on the MXU. The chunk→tile map is scalar-prefetched and drives the
  output BlockSpec: consecutive chunks of one tile revisit the same VMEM
  output block (zeroed on each tile's first chunk), so each output row is
  written to HBM exactly once.
* Backward: d(A @ x) = A^T @ g is the same kernel over a transposed plan
  (rows/cols swapped, re-sorted) built alongside the forward plan.

FLOP cost is 2 * E * tile_r * d — independent of ``chunk`` — so tiles stay
small (256); ``chunk`` only trades padding waste against grid overhead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SpmmPlan(NamedTuple):
    """Chunked-COO scatter plan (host-built, one-time).

    ``n_chunks = rows.shape[0]``; every tile owns >= 1 chunk (all-padding
    if empty) so every output block gets zeroed exactly once.

    The arrays are deliberately HOST numpy, not device arrays: models
    close over the plan inside jitted losses, and jax embeds closure
    constants into the lowered module by materializing them on the host —
    for a device array that is a device->host fetch of the whole plan
    through the (slow, tunneled) transfer path on every fresh lowering
    (measured: minutes for a 12 MB plan). Numpy constants lower directly.
    """

    rows: np.ndarray        # (n_chunks, chunk) int32 — dest row MINUS tile start
    cols: np.ndarray        # (n_chunks, chunk) int32 — global source node id
    vals: np.ndarray        # (n_chunks, chunk) float32 — 0.0 on padding
    chunk_tile: np.ndarray  # (n_chunks,) int32 — non-decreasing out-tile index
    chunk_first: np.ndarray  # (n_chunks,) int32 — 1 iff first chunk of its tile
    n_rows: int              # logical output rows (<= n_tiles * tile_r)
    tile_r: int


def _default_tile_chunk():
    """(tile_r, chunk) defaults, env-overridable for tuning/production.

    (256, 256) won the only reliable measurement — interleaved whole-epoch
    A/B on the gowalla north star (benchmarks/ab_spmm_epoch.json: 0.820
    s/epoch vs 0.845 for chunk=512 and 0.948 for chunk=512+pack2, with
    min==median to 3 digits). Microbenchmark deltas on the shared chip
    disagreed between runs by up to 13x and are recorded for the
    attribution probes only (ab_spmm_pack.json).
    """
    import os

    return (
        int(os.environ.get("NEUREC_SPMM_TILE", 256)),
        int(os.environ.get("NEUREC_SPMM_CHUNK", 256)),
    )


def build_spmm_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    tile_r: int = None,
    chunk: int = None,
) -> SpmmPlan:
    """Partition COO edges into per-row-tile chunk lists (numpy, host)."""
    d_tile, d_chunk = _default_tile_chunk()
    tile_r = d_tile if tile_r is None else tile_r
    chunk = d_chunk if chunk is None else chunk
    keep = vals != 0.0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    tile = rows // tile_r
    # sort by (dest tile, source col): tile-grouped for the scatter,
    # col-ascending within a tile for gather locality
    order = np.lexsort((cols, tile))
    rows, cols, vals, tile = rows[order], cols[order], vals[order], tile[order]

    n_tiles = -(-n_rows // tile_r)
    counts = np.bincount(tile, minlength=n_tiles)
    chunks_per_tile = np.maximum(-(-counts // chunk), 1)
    n_chunks = int(chunks_per_tile.sum())

    r = np.zeros((n_chunks, chunk), dtype=np.int32)
    c = np.zeros((n_chunks, chunk), dtype=np.int32)
    v = np.zeros((n_chunks, chunk), dtype=np.float32)
    chunk_tile = np.zeros(n_chunks, dtype=np.int32)
    chunk_first = np.zeros(n_chunks, dtype=np.int32)

    starts = np.concatenate([[0], np.cumsum(counts)])
    ci = 0
    for t in range(n_tiles):
        lo, hi = int(starts[t]), int(starts[t + 1])
        chunk_first[ci] = 1
        for s in range(lo, hi, chunk) or [lo]:  # >=1 chunk even when empty
            k = min(chunk, hi - s)
            if k > 0:
                r[ci, :k] = rows[s : s + k] - t * tile_r
                c[ci, :k] = cols[s : s + k]
                v[ci, :k] = vals[s : s + k]
            chunk_tile[ci] = t
            ci += 1
        if lo == hi:  # empty tile: the padding chunk emitted above
            chunk_tile[ci - 1] = t
    assert ci == n_chunks

    return SpmmPlan(
        rows=r,
        cols=c,
        vals=v,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        n_rows=n_rows,
        tile_r=tile_r,
    )


def _scatter_kernel(tile_ref, first_ref, rows_ref, vals_ref, g_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile_r = out_ref.shape[0]
    chunk = rows_ref.shape[1]
    # rows/vals stay whole in VMEM (Mosaic forbids sublane-1 blocks); a
    # dynamic sublane slice picks this grid step's chunk
    rows = rows_ref[pl.ds(i, 1), :]                           # (1, chunk)
    vals = vals_ref[pl.ds(i, 1), :]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_r, chunk), 0)
    sel = jnp.where(rows == r_iota, vals, 0.0)                # (tile_r, chunk)
    g = g_ref[:]
    if g.dtype != jnp.float32:
        # bf16 compute path: both MXU operands bf16, f32 accumulate
        sel = sel.astype(g.dtype)
    out_ref[:] += jnp.dot(sel, g, preferred_element_type=jnp.float32)


def scatter_arrays(
    chunk_tile,
    chunk_first,
    rows,
    vals,
    gathered: jnp.ndarray,
    n_rows: int,
    tile_r: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(n_rows, d) <- segment-sum of ``gathered`` (n_chunks*chunk, d) rows.

    ``gathered[i*chunk + e]`` lands on output row
    ``chunk_tile[i]*tile_r + rows[i, e]`` scaled by ``vals[i, e]``.
    The plan operands may be host numpy (closure constants) OR traced
    arrays — the latter is how the sharded path feeds per-device plan
    shards inside ``shard_map`` (ops/graph.py::spmm_sharded).
    Plain traceable fn — callers jit it (no nested pjit, see CLAUDE.md).
    """
    n_chunks, chunk = rows.shape
    d = gathered.shape[1]
    n_tiles = -(-n_rows // tile_r)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows, whole-array resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vals, whole-array resident
            pl.BlockSpec((chunk, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_r, d),
            lambda i, tile_map, first_map: (tile_map[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_r, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * chunk * tile_r * d,
            bytes_accessed=(
                gathered.size * 4 + rows.size * 8 + n_tiles * tile_r * d * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, chunk_first, rows, vals, gathered)
    return out[:n_rows]


def _scatter_kernel_packed(
    tile_ref, first_ref, rows_ref, vals_ref, g_ref, out_ref, *, pack, d
):
    """Packed variant: ``pack`` edges share one 128-lane gathered row.

    A (N, 64) array is physically padded to 128 lanes on TPU (the minor
    dim always tiles to 128), so the d=64 gathered operand of the plain
    kernel moves HALF-EMPTY lanes through HBM twice (gather write + kernel
    read). Packing ``pack`` edges' feature rows side by side restores full
    lane density: g block is (chunk/pack, pack*d) and the kernel runs
    ``pack`` selector matmuls against static lane sub-blocks. rows/vals
    come pre-reordered into parity groups (``rows[:, h::pack]``
    concatenated along lanes) so each sub-block's selector is a contiguous
    static lane slice. FLOPs are unchanged (pack matmuls of chunk/pack
    contraction each).
    """
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile_r = out_ref.shape[0]
    cpp = g_ref.shape[0]  # chunk // pack
    g = g_ref[:]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_r, cpp), 0)
    acc = None
    for h in range(pack):
        # rows/vals are (n_chunks*pack, cpp): parity group h of chunk i
        # lives at sublane i*pack + h — a lane-sliced (1, cpp) vector from
        # a (1, chunk) load has an offset layout Mosaic cannot broadcast
        rows_h = rows_ref[pl.ds(i * pack + h, 1), :]  # (1, cpp)
        vals_h = vals_ref[pl.ds(i * pack + h, 1), :]
        sel = jnp.where(rows_h == r_iota, vals_h, 0.0)  # (tile_r, cpp)
        gh = g[:, h * d : (h + 1) * d]
        if gh.dtype != jnp.float32:
            sel = sel.astype(gh.dtype)
        part = jnp.dot(sel, gh, preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[:] += acc


def _pack_factor(d: int, chunk: int) -> int:
    """Edges per 128-lane gathered row (NEUREC_SPMM_PACK=2/4 to opt in).

    Measured OFF by default: the op is bound by the random gather read
    (benchmarks/ab_spmm_pack.json — the gather+reduce probe alone costs
    ~90% of the full op), and XLA lowers the pair-index gather the packed
    path needs WORSE than the plain row gather, so lane-packing the
    gathered intermediate loses despite halving its physical footprint.
    Kept for narrow-d cases (d<=32) where the padding waste is 4-8x.

    An opt-in factor only engages when the packed row stays lane-exact
    (``d * pack`` a multiple of 128) — the packed kernel's static lane
    slices land at multiples of d, which Mosaic rejects off the 128-lane
    grid — and when the plan's chunk is divisible by it; otherwise the
    factor halves until both hold (worst case 1 = plain kernel).
    """
    import os

    flag = os.environ.get("NEUREC_SPMM_PACK", "auto")
    if flag in ("", "auto", "0", "1"):
        return 1
    p = int(flag)
    while p > 1 and (chunk % p != 0 or (d * p) % 128 != 0):
        p //= 2
    return max(p, 1)


def plan_spmm_packed(
    plan: SpmmPlan,
    x: jnp.ndarray,
    pack: int,
    interpret: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """A @ x with the lane-packed scatter kernel (``pack`` edges per row).

    The gather is expressed as ``x[cols_pairs].reshape(E/pack, pack*d)``
    so XLA emits ONE gather whose materialized result is full-lane-density
    — (E/2, 128) for d=64 bf16 — instead of the physically-padded
    (E, 128) the plain path writes and re-reads.
    """
    if compute_dtype is not None and x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
    n_chunks, chunk = plan.rows.shape
    cpp = chunk // pack
    d = x.shape[1]

    # host-side parity-group reorder of the plan (cheap numpy, lowered as
    # closure constants exactly like the plain plan arrays): row i*pack+h
    # holds parity group h (edges h, h+pack, ...) of chunk i
    rows_p = np.stack(
        [plan.rows[:, h::pack] for h in range(pack)], axis=1
    ).reshape(n_chunks * pack, cpp)
    vals_p = np.stack(
        [plan.vals[:, h::pack] for h in range(pack)], axis=1
    ).reshape(n_chunks * pack, cpp)
    # one gather, packed result: row j of chunk block = edges j*pack..+pack-1
    g = x[plan.cols.reshape(-1, pack)].reshape(-1, pack * d)

    n_tiles = -(-plan.n_rows // plan.tile_r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows_p whole-resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vals_p whole-resident
            pl.BlockSpec(
                (cpp, pack * d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (plan.tile_r, d),
            lambda i, tile_map, first_map: (tile_map[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    import functools

    out = pl.pallas_call(
        functools.partial(_scatter_kernel_packed, pack=pack, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * plan.tile_r, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * chunk * plan.tile_r * d,
            bytes_accessed=(
                g.size * g.dtype.itemsize
                + rows_p.size * 8
                + n_tiles * plan.tile_r * d * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.chunk_tile, plan.chunk_first, rows_p, vals_p, g)
    return out[: plan.n_rows]


def plan_scatter(
    plan: SpmmPlan, gathered: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """`scatter_arrays` over a host-built SpmmPlan (closure-constant path)."""
    return scatter_arrays(
        plan.chunk_tile,
        plan.chunk_first,
        plan.rows,
        plan.vals,
        gathered,
        plan.n_rows,
        plan.tile_r,
        interpret=interpret,
    )


def stack_plans(plans):
    """Pad per-block SpmmPlans to a common chunk count and stack them.

    All plans must share ``tile_r`` and ``n_rows`` (each device block has
    the same logical output length). Padding chunks map to the LAST tile
    (keeps ``chunk_tile`` non-decreasing — the output block was already
    zeroed by its real first chunk) with ``chunk_first=0`` and zero vals,
    so they accumulate nothing.

    Returns numpy ``(rows, cols, vals, tile, first)`` with a leading
    n_blocks dim — ready to be placed ``P('data', ...)`` for ``shard_map``.
    """
    tile_r = plans[0].tile_r
    n_rows = plans[0].n_rows
    assert all(p.tile_r == tile_r and p.n_rows == n_rows for p in plans)
    chunk = plans[0].rows.shape[1]
    n_max = max(p.rows.shape[0] for p in plans)
    n_tiles = -(-n_rows // tile_r)
    B = len(plans)
    rows = np.zeros((B, n_max, chunk), dtype=np.int32)
    cols = np.zeros((B, n_max, chunk), dtype=np.int32)
    vals = np.zeros((B, n_max, chunk), dtype=np.float32)
    tile = np.full((B, n_max), n_tiles - 1, dtype=np.int32)
    first = np.zeros((B, n_max), dtype=np.int32)
    for b, p in enumerate(plans):
        k = p.rows.shape[0]
        rows[b, :k] = p.rows
        cols[b, :k] = p.cols
        vals[b, :k] = p.vals
        tile[b, :k] = p.chunk_tile
        first[b, :k] = p.chunk_first
    return rows, cols, vals, tile, first


def plan_spmm(
    plan: SpmmPlan,
    x: jnp.ndarray,
    interpret: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """A @ x for the plan's (n_rows, n_src) sparse A; gather in XLA,
    scatter in the Pallas kernel. Not differentiable on its own — models go
    through :func:`make_spmm` which wires the transposed-plan VJP.

    ``compute_dtype=jnp.bfloat16`` casts the features BEFORE the gather
    (halving the dominant random-access HBM traffic) and runs the selector
    matmul at the MXU's bf16 rate; accumulation stays f32 in the kernel.

    The lane-packed kernel (see :func:`_scatter_kernel_packed`) is
    OPT-IN via NEUREC_SPMM_PACK=2/4 — it removes the physical lane
    padding of the gathered intermediate but measured slower end-to-end
    at d=64 (benchmarks/ab_spmm_epoch.json), so the default is the plain
    kernel; see :func:`_pack_factor` for the engage conditions.
    """
    if compute_dtype is not None and x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
    pack = _pack_factor(x.shape[1], plan.rows.shape[1])
    if pack > 1:
        return plan_spmm_packed(
            plan, x, pack, interpret=interpret, compute_dtype=None
        )
    g = x[plan.cols.reshape(-1)]
    return plan_scatter(plan, g, interpret=interpret)


def _spmm_compute_dtype():
    """Feature dtype for the SpMM gather + selector matmul.

    On real TPUs the MXU's DEFAULT precision already reduces f32 matmul
    operands to bf16 (f32 accumulate), so feeding bf16 explicitly is
    numerically equivalent — measured on the gowalla north star: losses
    and metrics identical to every printed digit over 12 epochs, and
    drift only in the 4th decimal after 150 (the explicit cast rounds
    to-nearest while the MXU path may truncate) — while halving the
    dominant random-gather HBM traffic. Hence bf16 is the TPU default.
    On CPU (incl. Pallas interpret mode, where matmuls are true f32) the
    default stays f32 so numerics match the oracles.
    NEUREC_SPMM_DTYPE=f32|bf16 overrides either way.
    """
    import os

    flag = os.environ.get("NEUREC_SPMM_DTYPE", "auto")
    if flag in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if flag in ("f32", "float32"):
        return None
    if flag != "auto":
        # fail loudly: a typo silently landing on bf16 would defeat an
        # explicit attempt to force exact f32
        raise ValueError(
            "NEUREC_SPMM_DTYPE must be 'f32', 'bf16' or 'auto', got %r"
            % flag
        )
    if os.environ.get("NEUREC_PALLAS_INTERPRET", "") == "1":
        return None  # interpret mode does true f32 matmuls — keep oracles exact
    return (
        jnp.bfloat16
        if jax.devices()[0].platform.lower() not in ("cpu",)
        else None
    )


def make_spmm(
    plan: SpmmPlan,
    plan_t: SpmmPlan,
    interpret: bool = False,
    compute_dtype="env",
):
    """Differentiable x -> A @ x with d/dx = A^T @ g via the transposed plan.

    The plans are closure constants (same lifecycle as SparseAdj's arrays in
    models' jitted losses). Adjacency values are not trained anywhere in the
    zoo, so only x carries a tangent.
    """
    if compute_dtype == "env":
        compute_dtype = _spmm_compute_dtype()

    @jax.custom_vjp
    def f(x):
        return plan_spmm(plan, x, interpret=interpret,
                         compute_dtype=compute_dtype)

    def fwd(x):
        return f(x), None

    def bwd(_, gout):
        return (
            plan_spmm(plan_t, gout, interpret=interpret,
                      compute_dtype=compute_dtype),
        )

    f.defvjp(fwd, bwd)
    return f
