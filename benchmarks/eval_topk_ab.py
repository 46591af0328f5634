"""Selection-op A/B at eval scale: lax.top_k vs exact segment-gather scheme.

ops/fast_topk.py computes exact top-K ids via approx_max_k lower-bound
thresholding + hot-segment gather + small re-rank. Measured here against
lax.top_k on (2048, 38912) f32 with distinct inputs per dispatch (no
dispatch-cache serving) and a rowmax probe as the RTT+read floor.

Verdict (committed in benchmarks/eval_topk_ab.json): NOT integrated —
the scheme's ~3 full passes over the score matrix cost about what
XLA's TopK costs on this chip (top_k op ~2.7 ms vs fast ~7.1 ms after
floor subtraction in the recorded session), so the evaluator keeps
lax.top_k. The module stays available (exact, tested incl. ties and
overflow detection) for hardware/XLA versions where TopK is the
N*K-cost path the K-scaling measurements suggest it sometimes is.

Run:  python benchmarks/eval_topk_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

OUT = os.path.join(REPO, "benchmarks", "eval_topk_ab.json")


def main():
    import jax
    import jax.numpy as jnp

    from neurec_tpu.ops.fast_topk import exact_topk_indices

    B, I, K = 2048, 38912, 20
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.standard_normal((B, I)).astype(np.float32))
        for _ in range(6)
    ]
    for x in xs:
        x.block_until_ready()

    progs = {
        "lax.top_k K=20": jax.jit(lambda x: jax.lax.top_k(x, K)[1].sum()),
        "lax.top_k K=64": jax.jit(lambda x: jax.lax.top_k(x, 64)[1].sum()),
        "fast exact seg128 hot64": jax.jit(
            lambda x: exact_topk_indices(x, K)[0].sum()
        ),
        "approx_max_k r=.99 (inexact)": jax.jit(
            lambda x: jax.lax.approx_max_k(x, K, recall_target=0.99)[1].sum()
        ),
        "rowmax (RTT+read floor)": jax.jit(lambda x: x.max(axis=1).sum()),
    }
    for x in xs[:2]:  # exactness of the fast path on this platform
        idx, ovf = jax.jit(lambda x: exact_topk_indices(x, K))(x)
        assert int(ovf) == 0
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(jax.lax.top_k(x, K)[1])
        )
    for f in progs.values():
        np.asarray(f(xs[0]))
    times = {k: [] for k in progs}
    for r in range(5):
        for k, f in progs.items():
            t0 = time.perf_counter()
            for x in xs:
                np.asarray(f(x))
            times[k].append(round((time.perf_counter() - t0) / len(xs), 5))

    out = {"shape": [B, I], "k": K,
           "protocol": "distinct inputs per dispatch, np.asarray-forced, "
           "interleaved rounds; subtract the rowmax floor (dispatch RTT + "
           "one full read) to compare op costs",
           "variants": {}}
    for k, ts in times.items():
        out["variants"][k] = {"rounds_s_per_call": ts, "min_s": min(ts)}
        print("%-30s min %.4fs/call" % (k, min(ts)))
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
