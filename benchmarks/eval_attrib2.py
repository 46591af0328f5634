"""Eval optimization candidates, measured before building (VERDICT r3 #3).

eval_attrib.py located the cost: per 2048-user batch at gowalla scale the
raw matmul is ~1.9 ms, per-call mask BUILD+apply adds ~2.4 ms and
lax.top_k ~2.5 ms. Candidates measured here, all EXACT:

* maskgather — the train-item mask of the FIXED eval users is precomputed
  once (device, int8 (n_test, I)) and gathered per batch instead of
  rebuilt by scatter every call.
* two-stage top_k — top-K per 512-item segment (exact: the global top-K
  takes at most K from one segment), then top-K over the (75*K)
  candidates; replaces one wide TopK with a batched narrow one + a tiny
  one.

Writes benchmarks/eval_attrib2.json.

PROTOCOL CAVEAT (added after the fact): these timings predate the
strict doctrine (block_until_ready on repeated identical dispatches can
be cache-served / return early on the tunneled chip). Their RELATIVE
attribution held up, but for decisions use the distinct-params
np.asarray protocol of eval_bits_prod_ab.py / eval_topk_ab.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

from benchmarks.gowalla_northstar import ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "eval_attrib2.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.ops.pallas_kernels import build_train_mask, masked_scores
    from neurec_tpu.trainer import Trainer

    ensure_local_copy()
    conf = Config(
        os.path.join(REPO, "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=[
            "--recommender=MF",
            "--data.input.path=%s" % os.path.join(REPO, "dataset"),
            "--data.input.dataset=gowalla",
            "--data.column.format=UI",
            "--data.convert.separator=','",
            "--splitter=ratio", "--ratio=0.8", "--by_time=False",
            "--epochs=0", "--embedding_size=64", "--topk=[20]",
            "--metric=[\"Recall\",\"NDCG\"]",
            "--test_batch_size=2048",
        ],
    )
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_SilentLogger())
    trainer.initialize()
    params = trainer.params
    ev = trainer.evaluator.evaluator

    num_items = ev.num_items
    K = min(ev.max_top, num_items)
    users = ev.test_users
    B = 2048
    n_batches = len(users) // B
    users_np = users[: n_batches * B].astype(np.int32)
    users_b = jnp.asarray(users_np.reshape(n_batches, B))
    pos_np = np.asarray(
        [ev._user_pos_index[int(u)] for u in users_np], dtype=np.int32
    )
    sel_b = jnp.asarray(pos_np.reshape(n_batches, B))
    factorized = model.eval_embeddings
    train_rows = ev._train_rows

    # --- precompute the per-test-user mask ON DEVICE, once -----------------
    SEG = 512
    i_pad = (-num_items) % SEG
    I_p = num_items + i_pad
    n_seg = I_p // SEG

    @jax.jit
    def chunk_mask(rows):
        return build_train_mask(rows, I_p)

    pre_parts = []
    t0 = time.perf_counter()
    for lo in range(0, len(pos_np), B):
        sel = jnp.asarray(users_np[lo : lo + B])
        pre_parts.append(chunk_mask(train_rows[sel]))
    pre_mask = jnp.concatenate(pre_parts, axis=0)  # (n_test_pad, I_p) int8
    pre_mask.block_until_ready()
    pre_s = time.perf_counter() - t0
    mask_mb = pre_mask.size / 1e6

    def scan_over(batch_fn):
        # pre-mask rides as a jit ARGUMENT: a closure constant this size is
        # uploaded to the remote compile service with the program (HTTP 413)
        def all_fn(params, users_b, sel_b, pre):
            def body(carry, xs):
                users, sel = xs
                return carry + batch_fn(params, users, sel, pre), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), (users_b, sel_b))
            return out

        return jax.jit(all_fn)

    def masked_today(params, users, sel, pre=None):
        u_vecs, item_table = factorized(params, users)
        return masked_scores(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32),
            train_rows[users],
        )

    # position index within the precomputed mask == batch-major order used
    # to build it: row i of pre_mask is users_np[i]
    def masked_pregather(params, users, pos, pre):
        u_vecs, item_table = factorized(params, users)
        if i_pad:
            item_table = jnp.pad(item_table, ((0, i_pad), (0, 0)))
        scores = jnp.dot(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
        m = pre[pos]
        return jnp.where(m != 0, -jnp.inf, scores)[:, :num_items]

    pos_b = jnp.asarray(
        np.arange(n_batches * B, dtype=np.int32).reshape(n_batches, B)
    )

    def topk1(masked):
        _, topk = jax.lax.top_k(masked, K)
        return jnp.sum(topk)

    def topk2(masked):
        if masked.shape[1] != I_p:
            masked = jnp.pad(
                masked, ((0, 0), (0, I_p - masked.shape[1])),
                constant_values=-jnp.inf,
            )
        seg = masked.reshape(masked.shape[0], n_seg, SEG)
        v1, i1 = jax.lax.top_k(seg, K)           # (B, n_seg, K) exact per seg
        flatv = v1.reshape(masked.shape[0], n_seg * K)
        flati = (
            i1 + (jnp.arange(n_seg, dtype=jnp.int32) * SEG)[None, :, None]
        ).reshape(masked.shape[0], n_seg * K)
        v2, i2 = jax.lax.top_k(flatv, K)
        gidx = jnp.take_along_axis(flati, i2, axis=1)
        return jnp.sum(gidx)

    variants = {
        "mask today (scatter build)": scan_over(
            lambda p, u, s, pre: jnp.sum(masked_today(p, u, s)[:, ::512])
        ),
        "mask pregathered": scan_over(
            lambda p, u, s, pre: jnp.sum(masked_pregather(p, u, s, pre)[:, ::512])
        ),
        "mask today + topk": scan_over(
            lambda p, u, s, pre: topk1(masked_today(p, u, s))
        ),
        "mask today + topk2stage": scan_over(
            lambda p, u, s, pre: topk2(masked_today(p, u, s))
        ),
        "mask pregathered + topk2stage": scan_over(
            lambda p, u, s, pre: topk2(masked_pregather(p, u, s, pre))
        ),
    }

    meta = {"users": int(n_batches * B), "num_items": num_items, "K": K,
            "batches": n_batches, "premask_mb": round(mask_mb, 1),
            "premask_build_s": round(pre_s, 3)}
    print(json.dumps(meta), flush=True)

    # correctness: pregather must equal today's path bit-exactly
    dummy = jnp.zeros((1, 1), jnp.int8)
    m1 = variants["mask today (scatter build)"](params, users_b, sel_b, dummy)
    m2 = variants["mask pregathered"](params, users_b, pos_b, pre_mask)
    assert float(m1) == float(m2), (float(m1), float(m2))
    t1 = variants["mask today + topk"](params, users_b, sel_b, dummy)
    t2 = variants["mask today + topk2stage"](params, users_b, sel_b, dummy)
    assert float(t1) == float(t2), (float(t1), float(t2))
    print("exactness checks passed", flush=True)

    times = {name: [] for name in variants}
    args_for = {
        "mask today (scatter build)": (sel_b, dummy),
        "mask today + topk": (sel_b, dummy),
        "mask today + topk2stage": (sel_b, dummy),
        "mask pregathered": (pos_b, pre_mask),
        "mask pregathered + topk2stage": (pos_b, pre_mask),
    }
    for name, f in variants.items():
        f(params, users_b, *args_for[name]).block_until_ready()
    for r in range(args.rounds):
        for name, f in variants.items():
            t0 = time.perf_counter()
            f(params, users_b, *args_for[name]).block_until_ready()
            times[name].append(round(time.perf_counter() - t0, 4))
        print("round %d done" % r, flush=True)

    results = {"meta": meta, "variants": {}}
    print()
    for name, ts in times.items():
        results["variants"][name] = {
            "rounds_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
        }
        print("%-32s min %.4fs  median %.4fs" % (
            name, min(ts), sorted(ts)[len(ts) // 2]))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
