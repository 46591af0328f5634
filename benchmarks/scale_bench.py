"""Gowalla-class scale benchmark: LightGCN + evaluation on a synthetic
large graph (the shipped reference gowalla file is a test split only, so a
synthetic interaction graph of the same magnitude stands in).

Exercises the large-graph paths: COO segment-sum SpMM (the dense adjacency
path is disabled at this node count), padded-row masking at a 40k-item
catalog, and the single-dispatch evaluator.

Run:  python benchmarks/scale_bench.py [--users 30000 --items 40000 --nnz 1500000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=30000)
    ap.add_argument("--items", type=int, default=40000)
    ap.add_argument("--nnz", type=int, default=1_500_000)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=2048)
    args = ap.parse_args()

    import jax
    from scipy.sparse import csr_matrix

    from neurec_tpu.data.synthetic import DictConfig, InMemoryDataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    rng = np.random.RandomState(0)
    # power-law-ish item popularity
    item_p = 1.0 / np.arange(1, args.items + 1) ** 0.7
    item_p /= item_p.sum()
    users = rng.randint(0, args.users, args.nnz)
    items = rng.choice(args.items, size=args.nnz, p=item_p)
    uniq = np.unique(np.stack([users, items]), axis=1)
    users, items = uniq[0], uniq[1]
    n = len(users)
    order = rng.permutation(n)
    cut = int(n * 0.8)
    tr, te = order[:cut], order[cut:]
    shape = (args.users, args.items)
    train = csr_matrix((np.ones(len(tr), np.float32), (users[tr], items[tr])), shape=shape)
    test = csr_matrix((np.ones(len(te), np.float32), (users[te], items[te])), shape=shape)
    dataset = InMemoryDataset(train, test, name="synthetic-gowalla")
    print("interactions:", train.nnz, "train /", test.nnz, "test", flush=True)

    conf = DictConfig(
        {
            "recommender": "LightGCN", "lr": 0.01, "reg": 1e-3,
            "embed_size": args.embed, "n_layers": args.layers,
            "batch_size": args.batch_size, "epochs": args.epochs, "learner": "adam",
            "adj_type": "pre", "verbose": 10 ** 9,
            "metric": ["Recall", "NDCG"], "topk": [20], "group_view": None,
            "test_batch_size": 1024,
        }
    )

    class _L:
        def info(self, m):
            pass

        debug = warning = error = critical = info

    model = get_model("LightGCN")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_L())
    trainer.initialize()
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    p, o, _ = trainer._epoch_fn(trainer.params, trainer.opt_state, key, 1)
    jax.block_until_ready(p)
    print("epoch compile %.1fs" % (time.perf_counter() - t0), flush=True)
    trainer.params, trainer.opt_state = p, o
    for w in range(6):  # warm up
        trainer.params, trainer.opt_state, _ = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.fold_in(key, 50 + w), 1
        )
    jax.block_until_ready(trainer.params)

    t0 = time.perf_counter()
    for e in range(args.epochs):
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.fold_in(key, e), e + 1
        )
    jax.block_until_ready(trainer.params)
    dt = (time.perf_counter() - t0) / args.epochs
    train_tput = train.nnz / dt

    ev = trainer.evaluator.evaluator
    t0 = time.perf_counter()
    ev.evaluate_raw(model.predict, trainer.params)
    eval_compile = time.perf_counter() - t0
    for _ in range(2):
        ev.evaluate_raw(model.predict, trainer.params)
    t0 = time.perf_counter()
    ev.evaluate_raw(model.predict, trainer.params)
    eval_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "LightGCN synthetic-gowalla throughput",
        "users": args.users, "items": args.items, "nnz": int(train.nnz),
        "batch_size": args.batch_size,
        "layers": args.layers,
        "train_examples_per_s": round(train_tput, 1),
        "epoch_ms": round(dt * 1000, 1),
        "eval_users_per_s": round(len(ev.test_users) / eval_dt, 1),
        "eval_compile_s": round(eval_compile, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
