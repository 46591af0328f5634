"""Dynamic-DMA issue-rate probe (VERDICT r4 next #5).

The round-3/4 rejection of the 2-pass streaming-permutation SpMM
(segment-broadcast + radix bucket flush) rests on ONE unmeasured
quantity: how fast a Pallas TPU kernel can issue small dynamic-offset
DMAs (the per-bucket flushes — ~6-48k per SpMM call at gowalla scale,
CLAUDE.md "rejected on paper"). This commits the measurement.

Kernel: N copies of a (rows, 128) f32 VMEM tile to dynamic HBM row
offsets (scalar-prefetched), in two modes:
  * serial    — start(); wait() each copy (latency-bound floor);
  * pipelined — W=8 outstanding copies on a semaphore ring (the real
    flush pattern; measures sustained issue rate).

Decision rule: the permutation replaces the random 256 B-row gather
(~90% of the 0.8 ms SpMM call). To win it must flush its buckets in
well under that, i.e. sustain  >= n_flushes / 0.5 ms  =  12-96 M DMA/s.
Anything in the single-digit M/s range (typical for small TPU DMAs)
closes the headroom permanently.

Protocol (CLAUDE.md doctrine): distinct-input pool, np.asarray-forced,
interleaved variants, min over rounds; a 1-DMA floor probe subtracts
the ~20-30 ms dispatch constant.

Run: python benchmarks/dma_rate.py [--n 65536] [--rounds 5]
Writes benchmarks/dma_rate.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_ROWS = 1 << 16  # HBM target buffer rows


def _serial_kernel(n_offs, n_dma, rows, offs_ref, out_ref):
    # n_dma may exceed the SMEM-resident offset count: indices cycle
    # (same dynamic addresses rewritten — identical DMA cost, write-only)
    def body(scratch, sem):
        scratch[:] = jnp.full((rows, 128), 1.0, jnp.float32)

        def step(k, carry):
            off = offs_ref[jax.lax.rem(k, n_offs)]
            dma = pltpu.make_async_copy(
                scratch, out_ref.at[pl.ds(off, rows), :], sem
            )
            dma.start()
            dma.wait()
            return carry

        jax.lax.fori_loop(0, n_dma, step, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((rows, 128), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _pipelined_kernel(n_offs, n_dma, rows, n_outstanding, offs_ref, out_ref):
    def body(scratch, sems):
        scratch[:] = jnp.full((rows, 128), 1.0, jnp.float32)

        def make(k, slot):
            off = offs_ref[jax.lax.rem(k, n_offs)]
            return pltpu.make_async_copy(
                scratch, out_ref.at[pl.ds(off, rows), :], sems.at[slot]
            )

        def step(k, carry):
            slot = jax.lax.rem(k, n_outstanding)

            @pl.when(k >= n_outstanding)
            def _():
                make(k - n_outstanding, slot).wait()

            make(k, slot).start()
            return carry

        jax.lax.fori_loop(0, n_dma, step, 0)

        def drain(j, carry):
            k = n_dma - n_outstanding + j

            @pl.when(k >= 0)
            def _():
                make(k, jax.lax.rem(k, n_outstanding)).wait()

            return carry

        jax.lax.fori_loop(0, n_outstanding, drain, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((rows, 128), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((n_outstanding,)),
    )


def build(n_offs, n_dma, rows, mode, n_outstanding=8, interpret=False):
    if mode == "serial":
        kernel = functools.partial(_serial_kernel, n_offs, n_dma, rows)
    else:
        kernel = functools.partial(
            _pipelined_kernel, n_offs, n_dma, rows, n_outstanding
        )

    @jax.jit
    def run(offs):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            out_shape=jax.ShapeDtypeStruct((OUT_ROWS, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(offs)
        # fetch only a sliver: np.asarray of the full (OUT_ROWS, 128)
        # buffer would move 32 MB through the tunnel per call and swamp
        # the signal (first probe revision measured exactly that)
        return out[0, :8]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536,
                    help="distinct SMEM-resident offsets (SMEM-bounded)")
    ap.add_argument("--repeat", type=int, default=8,
                    help="in-kernel cycles over the offsets: total DMAs "
                         "= n*repeat, amortizing the dispatch constant")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--pool", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "dma_rate.json"))
    args = ap.parse_args()
    n_total = args.n * args.repeat

    rng = np.random.RandomState(0)
    variants = {}
    results = {}
    rows_list = [1, 4, 16]  # 512 B, 2 KB, 8 KB per DMA

    def fresh_inputs(rows, count):
        # EVERY timed call gets a never-seen offset array: repeated
        # (program, input) pairs can be cache-served on the tunneled
        # chip (CLAUDE.md), which poisons min-over-rounds
        arrs = [
            jnp.asarray(
                rng.randint(0, OUT_ROWS - rows, args.n).astype(np.int32)
            )
            for _ in range(count)
        ]
        for a in arrs:
            a.block_until_ready()
        return arrs

    for rows in rows_list:
        for mode in ("serial", "pipelined"):
            fn = build(args.n, n_total, rows, mode,
                       interpret=args.interpret)
            np.asarray(fn(fresh_inputs(rows, 1)[0]))  # compile
            variants[(rows, mode)] = (fn, fresh_inputs(rows, args.rounds))
        # floor probe: same program shape, 1 DMA
        floor_fn = build(args.n, 1, rows, "serial",
                         interpret=args.interpret)
        np.asarray(floor_fn(fresh_inputs(rows, 1)[0]))
        variants[(rows, "floor")] = (floor_fn,
                                     fresh_inputs(rows, args.rounds))

    def timed(fn, arr):
        t0 = time.perf_counter()
        np.asarray(fn(arr))
        return time.perf_counter() - t0

    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for k, (fn, pool) in variants.items():
            times[k].append(timed(fn, pool[r]))
        print("round %d done" % r, flush=True)

    for rows in rows_list:
        floor = min(times[(rows, "floor")])
        for mode in ("serial", "pipelined"):
            t = min(times[(rows, mode)]) - floor
            rate = n_total / max(t, 1e-9)
            results["%dB_%s" % (rows * 512, mode)] = {
                "rounds_s": [round(x, 5) for x in times[(rows, mode)]],
                "floor_rounds_s": [
                    round(x, 5) for x in times[(rows, "floor")]
                ],
                "s_per_call_min": round(min(times[(rows, mode)]), 5),
                "floor_s": round(floor, 5),
                "n_dmas_per_call": n_total,
                "dmas_per_s": round(rate),
                "effective_GBps": round(rate * rows * 512 / 1e9, 2),
            }
            print("%6dB %-9s: %.3fms net  -> %.2fM DMA/s (%.1f GB/s)" % (
                rows * 512, mode, t * 1e3, rate / 1e6,
                rate * rows * 512 / 1e9), flush=True)

    # verdict: the flush either runs issue-bound well below the random
    # gather's effective bandwidth, or needs bucket staging beyond VMEM
    best_small = max(
        results.get("512B_serial", {}).get("dmas_per_s", 0),
        results.get("512B_pipelined", {}).get("dmas_per_s", 0),
    )
    small_gbps = best_small * 512 / 1e9
    gather_gbps = 95.0  # measured random-gather effective bw (CLAUDE.md,
    #                     benchmarks/ab_spmm_pack.json probes)
    big_gbps = max(
        results.get("8192B_serial", {}).get("effective_GBps", 0),
        results.get("8192B_pipelined", {}).get("effective_GBps", 0),
    )
    # open-bucket VMEM staging needed to flush at the 8 KB granularity
    # that reaches streaming bandwidth, for a gowalla-scale SpMM
    # (~70k destination rows of 256 B): one 8 KB buffer per 32-row bucket
    staging_mb = (70_000 / 32) * 8192 / 2**20
    results["meta"] = {
        "n_dma_per_call": n_total, "protocol":
        "fresh offsets per call, interleaved, min-over-rounds, "
        "floor-subtracted, sliver fetch",
        "issue_rate_small_dma_per_s": best_small,
        "verdict": (
            "streaming permutation CLOSED: 512 B bucket flushes are "
            "issue-bound at %.1fM/s = %.0f GB/s effective — %.1fx SLOWER "
            "per byte than the ~%.0f GB/s random row gather they would "
            "replace; reaching streaming bandwidth (%.0f GB/s at 8 KB "
            "flushes) requires >= 32-row buckets whose open-bucket VMEM "
            "staging is ~%.0f MB for a gowalla-scale SpMM, over the "
            "~16 MB scoped-VMEM limit. The flush mechanism loses at every "
            "feasible granularity; headroom closed with measurement."
            % (best_small / 1e6, small_gbps,
               gather_gbps / max(small_gbps, 1e-9), gather_gbps,
               big_gbps, staging_mb)
            if small_gbps < gather_gbps
            else "streaming permutation VIABLE - prototype it"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["meta"], indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
