"""Attribute gowalla-scale eval time: score+mask vs top-K vs metrics.

The full-catalog evaluator is one jitted scan (eval/evaluator.py); this
driver times progressively larger slices of its per-batch pipeline in one
process (interleaved rounds, min over rounds) to locate the cost before
building any fused top-K kernel (VERDICT r3 #3/#4: measure first).

Writes benchmarks/eval_attrib.json.

PROTOCOL CAVEAT (added after the fact): these timings predate the
strict doctrine (block_until_ready on repeated identical dispatches can
be cache-served / return early on the tunneled chip). Their RELATIVE
attribution held up, but for decisions use the distinct-params
np.asarray protocol of eval_bits_prod_ab.py / eval_topk_ab.py.

Run:  python benchmarks/eval_attrib.py [--rounds 5]
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

OUT = os.path.join(REPO, "benchmarks", "eval_attrib.json")


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
    from neurec_tpu.ops.metrics import all_metrics, hit_matrix
    from neurec_tpu.ops.pallas_kernels import masked_scores
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
    ev = trainer.evaluator.evaluator  # UniEvaluator

    num_items = ev.num_items
    K = min(ev.max_top, num_items)
    users = ev.test_users
    B = 2048
    n_batches = len(users) // B  # whole batches only — timing, not parity
    users_b = jnp.asarray(
        users[: n_batches * B].reshape(n_batches, B).astype(np.int32)
    )
    sel_b = jnp.asarray(
        np.asarray(
            [ev._user_pos_index[int(u)] for u in users[: n_batches * B]],
            dtype=np.int32,
        ).reshape(n_batches, B)
    )
    factorized = model.eval_embeddings
    train_rows = ev._train_rows
    test_rows, test_lens = ev._test_rows, ev._test_lens

    def scan_over(batch_fn):
        def all_fn(params, users_b, sel_b):
            def body(carry, xs):
                users, sel = xs
                return carry + batch_fn(params, users, sel), None

            out, _ = jax.lax.scan(
                body, jnp.zeros(()), (users_b, sel_b)
            )
            return out

        return jax.jit(all_fn)

    def score_mask(params, users, sel):
        u_vecs, item_table = factorized(params, users)
        masked = masked_scores(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32),
            train_rows[users],
        )
        return jnp.sum(masked[:, ::512])  # touch a slice; no topk

    def score_mask_topk(params, users, sel):
        u_vecs, item_table = factorized(params, users)
        masked = masked_scores(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32),
            train_rows[users],
        )
        _, topk = jax.lax.top_k(masked, K)
        return jnp.sum(topk)

    def full(params, users, sel):
        u_vecs, item_table = factorized(params, users)
        masked = masked_scores(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32),
            train_rows[users],
        )
        _, topk = jax.lax.top_k(masked, K)
        hits = hit_matrix(topk, test_rows[sel], test_lens[sel])
        m = all_metrics(hits, test_lens[sel])
        return jnp.sum(m)

    def matmul_only(params, users, sel):
        u_vecs, item_table = factorized(params, users)
        s = jnp.dot(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(s[:, ::512])

    variants = {
        "matmul only (no pallas mask)": scan_over(matmul_only),
        "score+mask": scan_over(score_mask),
        "score+mask+topk": scan_over(score_mask_topk),
        "score+mask+topk+metrics": scan_over(full),
        "evaluate_raw (production)": None,
    }

    meta = {
        "users": int(n_batches * B), "num_items": num_items, "K": K,
        "batches": n_batches, "batch": B,
    }
    print(json.dumps(meta), flush=True)

    # compile
    for name, f in variants.items():
        if f is not None:
            f(params, users_b, sel_b).block_until_ready()

    ev.evaluate_raw(model.predict, params)  # compile production path

    times = {name: [] for name in variants}
    for r in range(args.rounds):
        for name, f in variants.items():
            t0 = time.perf_counter()
            if f is None:
                ev.evaluate_raw(model.predict, params)
            else:
                f(params, users_b, sel_b).block_until_ready()
            times[name].append(round(time.perf_counter() - t0, 4))
        print("round %d done" % r, flush=True)

    results = {"meta": meta, "protocol":
               "interleaved rounds, min over rounds, one process",
               "variants": {}}
    print()
    for name, ts in times.items():
        results["variants"][name] = {
            "rounds_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
        }
        print("%-32s min %.4fs  median %.4fs" % (name, min(ts),
                                                 sorted(ts)[len(ts) // 2]))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
