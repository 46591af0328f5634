"""North-star scale run: LightGCN on real gowalla data (BASELINE.md).

The reference ships ``dataset/gowalla.test`` (217,242 comma-separated UI
rows over 29,858 users x 38,546 items — the test split of the LightGCN
paper's gowalla). This script ratio-splits it 80/20 per user with the
framework's own pipeline and trains LightGCN to a target NDCG@20,
recording epochs-to-target, train examples/s and eval users/s — replacing
``scale_bench.py``'s synthetic stand-in with a real large-graph number
(VERDICT round 1, missing #5). Exercises the COO segment-sum SpMM path
(ops/graph.py) and the Pallas masked-score eval at a 38.5k-item catalog.

Run (real TPU):  python benchmarks/gowalla_northstar.py --epochs 120
Resume-safe: appends each eval point to benchmarks/gowalla_northstar.json.
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

OUT = os.path.join(REPO, "benchmarks", "gowalla_northstar.json")
SRC = "/root/reference/dataset/gowalla.test"
LOCAL = os.path.join(REPO, "dataset", "gowalla.rating")

# LightGCN-paper gowalla hyperparameters, shared with gowalla_quality.py so
# the two scripts provably run the same experiment
LIGHTGCN_GOWALLA_ARGS = [
    "--lr=0.001", "--reg=1e-4", "--embed_size=64", "--n_layers=3",
    "--batch_size=2048", "--adj_type=pre",
]


def ensure_local_copy():
    if not os.path.exists(LOCAL):
        os.makedirs(os.path.dirname(LOCAL), exist_ok=True)
        with open(SRC) as f, open(LOCAL, "w") as g:
            g.write(f.read())
    return LOCAL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--target_ndcg20", type=float, default=0.28)
    ap.add_argument("--n_layers", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--out", default=OUT,
                    help="JSON output path (default overwrites the record)")
    args = ap.parse_args()

    ensure_local_copy()

    import jax
    import jax.numpy as jnp

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    conf = Config(
        os.path.join(REPO, "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=[
            "--recommender=LightGCN",
            "--data.input.path=%s" % os.path.join(REPO, "dataset"),
            "--data.input.dataset=gowalla",
            "--data.column.format=UI",
            "--data.convert.separator=','",
            "--splitter=ratio",
            "--ratio=0.8",
            "--by_time=False",
            # LightGCN-paper gowalla hyperparameters (LIGHTGCN_GOWALLA_ARGS
            # is the canonical set; the CLI flags vary them for sweeps)
            "--lr=%s" % args.lr,
            "--reg=1e-4",
            "--embed_size=64",
            "--n_layers=%d" % args.n_layers,
            "--batch_size=%d" % args.batch_size,
            "--adj_type=pre",
            "--epochs=%d" % args.epochs,
            "--topk=[20]",
            "--metric=[\"Recall\",\"NDCG\"]",
            "--test_batch_size=2048",
        ],
    )

    class _SilentLogger:
        def info(self, msg):
            pass

        debug = warning = error = critical = info

    t0 = time.perf_counter()
    dataset = Dataset(conf)
    model = get_model("LightGCN")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_SilentLogger())
    trainer.initialize()
    setup_s = time.perf_counter() - t0
    per_epoch = int(dataset.train_matrix.nnz)
    n_eval_users = len(trainer.evaluator.evaluator.test_users)
    import os as _os

    meta = {
        "dataset": "gowalla (217,242 UI; 80/20 per-user ratio split)",
        "num_users": dataset.num_users, "num_items": dataset.num_items,
        "train_nnz": per_epoch, "eval_users": n_eval_users,
        "setup_s": round(setup_s, 1),
        # full run provenance: sweep runs must be distinguishable from the
        # canonical lr=0.001 / batch=2048 record
        "config": {"lr": args.lr, "batch_size": args.batch_size,
                   "n_layers": args.n_layers, "embed_size": 64,
                   "adj_type": "pre",
                   "spmm_dtype": _os.environ.get("NEUREC_SPMM_DTYPE", "auto")},
    }
    # closed-form HBM-traffic model of one train step (the SpMM is
    # bandwidth-bound: its FLOPs are 2*E*d ~ 50 MFLOP, noise on the MXU).
    # Per SpMM: random-gather E feature rows + write n rows + plan ints;
    # per step: n_layers fwd + n_layers transposed bwd SpMMs + the dense
    # Adam update of both tables (7 table-sized arrays).
    import numpy as np

    from neurec_tpu.ops.graph import _pallas_spmm_enabled
    from neurec_tpu.ops.pallas_spmm import _spmm_compute_dtype

    E = int(np.count_nonzero(np.asarray(model.adj.vals)))
    d = 64
    # the bf16 gather only exists on the Pallas path; the XLA segment-sum
    # fallback (NEUREC_SPMM_PALLAS=0) always gathers f32
    elem = (
        2
        if _pallas_spmm_enabled() and _spmm_compute_dtype() is not None
        else 4
    )
    n_nodes = dataset.num_users + dataset.num_items
    spmm_bytes = E * d * elem + n_nodes * d * 4 + E * 12
    step_bytes = spmm_bytes * args.n_layers * 2 + 7 * n_nodes * d * 4
    steps_per_epoch = -(-per_epoch // args.batch_size)
    meta["hbm_model"] = {
        "edges": E, "spmm_bytes": spmm_bytes, "step_bytes": step_bytes,
        "steps_per_epoch": steps_per_epoch,
        "peak_hbm_gbps": 819.0,  # TPU v5e
    }
    print(json.dumps(meta), flush=True)

    key = jax.random.PRNGKey(2018)
    history = []
    compile_s = None
    reached = None
    train_s = 0.0
    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state,
            jax.random.fold_in(key, epoch), jnp.int32(epoch),
        )
        jax.block_until_ready(trainer.params)
        dt = time.perf_counter() - t0
        if epoch == 1:
            compile_s = dt
        else:
            train_s += dt
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            t0 = time.perf_counter()
            raw = trainer.evaluator.evaluator.evaluate_raw(
                model.predict, trainer.params
            )
            eval_s = time.perf_counter() - t0
            # metric rows follow the conf order: Recall, NDCG @ [20]
            recall20, ndcg20 = float(raw[0, 0]), float(raw[1, 0])
            hbm = meta["hbm_model"]
            point = {
                "epoch": epoch, "loss": round(float(loss), 4),
                "Recall@20": round(recall20, 5), "NDCG@20": round(ndcg20, 5),
                "epoch_s": round(dt, 3),
                "examples_per_s": round(per_epoch / dt, 1),
                "eval_s": round(eval_s, 2),
                "eval_users_per_s": round(n_eval_users / eval_s, 1),
                "hbm_gbps": round(
                    hbm["step_bytes"] * hbm["steps_per_epoch"] / dt / 1e9, 1
                ),
                "hbm_util": round(
                    hbm["step_bytes"] * hbm["steps_per_epoch"] / dt / 1e9
                    / hbm["peak_hbm_gbps"], 3
                ),
            }
            history.append(point)
            print(json.dumps(point), flush=True)
            with open(args.out, "w") as f:
                json.dump({"meta": meta, "compile_s": compile_s,
                           "history": history}, f, indent=1)
            if reached is None and ndcg20 >= args.target_ndcg20:
                reached = {"epochs_to_target": epoch,
                           "target_ndcg20": args.target_ndcg20,
                           "train_wall_s_excl_compile": round(train_s, 1)}
                print(json.dumps(reached), flush=True)
    with open(args.out, "w") as f:
        json.dump({"meta": meta, "compile_s": compile_s,
                   "history": history, "reached": reached}, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
