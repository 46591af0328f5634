"""Heavy-tail (zipf) memory-cliff measurement (VERDICT r4 next #4).

Synthesizes a zipf-tailed dataset (default: 500k users, mean row ~20,
max row 10k, 16384 items — the VERDICT scale), trains MF for 2 epochs
and runs one full evaluation, then reports the row-structure footprints:

* csr_mb                — the irreducible CSR interaction footprint;
* padded_table_mb       — what the r4 padded-to-max (U, L_max) table
                          would have cost (BEFORE; ~100-1000x CSR);
* bloom_mb / edges_mb /
  bits_mb               — what the r5 structures actually cost (AFTER:
                          pair Bloom exclusion filter, streamed-eval edge
                          pairs, bits table when under budget);
* device_peak_mb        — measured device peak (memory_stats when the
                          backend exposes it), dominated by params +
                          (B, I) eval blocks, with NO padded table.

Run: python benchmarks/padded_cliff.py [--users 500000] [--items 16384]
     [--max-len 10000] [--out benchmarks/padded_cliff.json]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")


class _Conf(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)


class _ZipfDataset:
    dataset_name = "zipf-synthetic"

    def __init__(self, users, items, num_users, num_items, seed=0):
        rng = np.random.RandomState(seed)
        self.num_users, self.num_items = num_users, num_items
        order = np.argsort(users, kind="stable")
        users, items = users[order], items[order]
        self._train_u, self._train_i = [], []
        self._test = {}
        starts = np.searchsorted(users, np.arange(num_users + 1))
        for u in range(num_users):
            its = items[starts[u] : starts[u + 1]]
            if len(its) >= 2:
                self._test[u] = [int(its[0])]
                its = its[1:]
            self._train_u.append(np.full(len(its), u, np.int32))
            self._train_i.append(its)
        self._train_u = np.concatenate(self._train_u)
        self._train_i = np.concatenate(self._train_i)
        self.train_matrix = sps.csr_matrix(
            (np.ones(len(self._train_u), np.float32),
             (self._train_u, self._train_i)),
            shape=(num_users, num_items),
        )

    def get_user_train_dict(self, by_time=False):
        d = {}
        csr = self.train_matrix
        for u in range(self.num_users):
            lo, hi = csr.indptr[u], csr.indptr[u + 1]
            if hi > lo:
                d[u] = csr.indices[lo:hi].tolist()
        return d

    def get_user_test_dict(self):
        return self._test

    def get_user_test_neg_dict(self):
        return None


def synth(num_users, num_items, mean_len, max_len, seed=0):
    rng = np.random.RandomState(seed)
    # zipf(2.5) has mean ~2, so rows average ~mean_len+1 with a genuine
    # power-law tail; lens[0] pins the max_len power user
    lens = np.minimum(rng.zipf(2.5, num_users) + mean_len - 1, max_len)
    lens = lens.astype(np.int64)
    lens[0] = max_len
    total = int(lens.sum())
    users = np.repeat(np.arange(num_users, dtype=np.int32), lens)
    items = rng.randint(0, num_items, total).astype(np.int32)
    # dedupe (u, i) pairs
    key = users.astype(np.int64) * num_items + items
    _, idx = np.unique(key, return_index=True)
    return users[idx], items[idx]


def device_peak_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**20
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=500_000)
    ap.add_argument("--items", type=int, default=16_384)
    ap.add_argument("--mean-len", type=int, default=20)
    ap.add_argument("--max-len", type=int, default=10_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/padded_cliff.json")
    args = ap.parse_args()

    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer
    import neurec_tpu.trainer as trainer_mod

    u, i = synth(args.users, args.items, args.mean_len, args.max_len)
    ds = _ZipfDataset(u, i, args.users, args.items)
    nnz = ds.train_matrix.nnz
    lens = np.diff(ds.train_matrix.indptr)
    l_max = int(lens.max())
    csr_mb = nnz * 4 / 2**20
    padded_mb = args.users * (l_max + (-l_max) % 8) * 4 / 2**20

    conf = _Conf(
        recommender="MF", epochs=args.epochs, batch_size=1024,
        embedding_size=64, reg_mf=0.0, learning_rate=0.01, learner="adam",
        num_negatives=1, is_pairwise="True", loss_function="bpr",
        init_method="normal", stddev=0.01, verbose=max(args.epochs, 1),
        topk=20, test_batch_size=1024, metric=["Recall", "NDCG"],
    )

    class Log:
        def info(self, m):
            print(m, flush=True)

        debug = warning = error = critical = info

    model = get_model("MF")(ds, conf)
    tr = Trainer(model, ds, conf, logger=Log())
    assert tr._excl_bloom is not None, (
        "expected Bloom exclusion at %.0f MB padded" % padded_mb
    )
    bloom_mb = tr._excl_bloom[0].nbytes / 2**20
    tr.initialize()
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for e in range(args.epochs):
        tr.params, tr.opt_state, loss = tr._epoch_fn(
            tr.params, tr.opt_state, jax.random.fold_in(key, e),
            jnp.int32(e + 1),
        )
    loss = float(loss)
    jax.block_until_ready(tr.params)
    train_s = time.time() - t0

    uni = tr.evaluator.evaluator
    t0 = time.time()
    result = uni.evaluate(model.predict, tr.params)
    eval_s = time.time() - t0
    program = uni._get_steps(model.predict)
    plan = program.plan
    bits_mb = sum(t.nbytes for t in uni._bits_tables.values()) / 2**20
    edges_mb = (
        sum(t.nbytes for t in uni._default_edges_cache) / 2**20
        if uni._default_edges_cache is not None
        else 0.0
    )
    padded_built = uni._UniEvaluator__train_rows is not None

    out = {
        "platform": jax.devices()[0].platform,
        "num_users": args.users, "num_items": args.items, "nnz": int(nnz),
        "max_row": l_max, "mean_row": float(lens.mean()),
        "csr_mb": round(csr_mb, 2),
        "padded_table_mb_BEFORE": round(padded_mb, 1),
        "bloom_mb": round(bloom_mb, 2),
        "edges_mb": round(edges_mb, 2),
        "bits_mb": round(bits_mb, 2),
        "after_over_csr": round(
            (bloom_mb + edges_mb + bits_mb) / max(csr_mb, 1e-9), 2
        ),
        "padded_over_csr": round(padded_mb / max(csr_mb, 1e-9), 1),
        "eval_tier": plan.name, "eval_stream": plan.stream,
        "padded_eval_table_built": padded_built,
        "train_s_for_%d_epochs" % args.epochs: round(train_s, 2),
        "final_loss": loss,
        "eval_s": round(eval_s, 2),
        "eval_result_head": result.split("\t")[0].strip(),
        "device_peak_mb": device_peak_mb(),
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
