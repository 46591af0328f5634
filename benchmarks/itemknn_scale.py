"""ItemKNN at a 100k-item catalog — the scale the r4 densified version
could not reach (VERDICT r4 missing #2 done-criterion).

Builds a sparse synthetic (U users x 100k items), computes the full
top-K item-item similarity with the blocked sparse implementation and
serves a batch of recommendations, recording wall times and the exact
device structure sizes. The r4 ``todense()`` would need U * I * 4 bytes
up front (40 GB at U=100k; the similarity itself never needs it), and
its rating materialization another U * I * 4.

Run: python benchmarks/itemknn_scale.py [--users 8192] [--items 100000]
Writes benchmarks/itemknn_scale.json.
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

import jax
import numpy as np
import scipy.sparse as sps


class _Conf(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=8192)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--nnz", type=int, default=800_000)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "itemknn_scale.json"))
    args = ap.parse_args()

    from neurec_tpu.models.general.itemknn import ItemKNN

    rng = np.random.RandomState(0)
    rows = rng.randint(0, args.users, args.nnz)
    cols = rng.randint(0, args.items, args.nnz)
    vals = rng.randint(1, 6, args.nnz).astype(np.float32)
    R = sps.csr_matrix((vals, (rows, cols)), shape=(args.users, args.items))
    R.sum_duplicates()

    class DS:
        train_matrix = R
        num_users, num_items = args.users, args.items

    model = ItemKNN(DS(), _Conf(
        neighbor=10, shrink=0.0, similarity="cosine", knn_block=args.block,
        epochs=0, verbose=1, batch_size=512,
    ))

    t0 = time.time()
    params = model.init_params(jax.random.PRNGKey(0))
    jax.block_until_ready(params["w_vals"])
    sim_s = time.time() - t0

    users = np.arange(512, dtype=np.int32)
    t0 = time.time()
    scores = model.predict(params, users)
    np.asarray(scores[:1, :8])
    predict_s = time.time() - t0
    # sanity: neighbors are real items, scores finite
    assert int(params["w_idx"].max()) < args.items
    assert np.isfinite(np.asarray(scores[:4])).all()

    nb = -(-args.items // args.block)
    out = {
        "platform": jax.devices()[0].platform,
        "users": args.users, "items": args.items, "nnz": int(R.nnz),
        "block": args.block, "n_block_pairs": nb * nb,
        "similarity_wall_s": round(sim_s, 2),
        "predict_512users_wall_s": round(predict_s, 2),
        "structure_mb": {
            "slice_pair_peak": round(
                2 * (args.users + 1) * args.block * 4 / 2**20, 1
            ),
            "sim_row_block": round(512 * nb * args.block * 4 / 2**20, 1),
            "w_table": round(
                (params["w_vals"].nbytes + params["w_idx"].nbytes) / 2**20, 1
            ),
            "user_rows_csr": round(
                (params["row_offsets"].nbytes + params["flat_items"].nbytes
                 + params["flat_vals"].nbytes) / 2**20, 1
            ),
        },
        "r4_dense_R_mb_BEFORE": round(args.users * args.items * 4 / 2**20, 1),
        "r4_dense_ratings_mb_BEFORE": round(
            args.users * args.items * 4 / 2**20, 1
        ),
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
