"""Third eval experiment: XLA-fused bit-plane masking (no Pallas, no scatter).

With GLOBAL bit-plane packing (item c*(I/8)+j -> plane c, byte j) the
mask expansion is `((bits[:, None, :] >> plane) & 1).reshape(B, I)` — a
broadcast + elementwise + row-major reshape that XLA can fuse into the
score matmul's epilogue together with the `where`. If it fuses, the
mask third of eval cost (~1/3, eval_attrib.json) collapses to the bits
gather (~10 MB/batch).

Variants (all EXACT, same -inf placement):
  pallas today      — masked_scores + per-call scatter build (baseline)
  xla bits fused    — dot + where(bit-plane expand) from a precomputed
                      (n_test, I_p/8) table (jit arg, not closure)
  both + lax.top_k  — end shape of the full pipeline

Writes benchmarks/eval_attrib3.json.
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

from benchmarks.gowalla_northstar import ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "eval_attrib3.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 6

    import jax
    import jax.numpy as jnp

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.ops.pallas_kernels import (
        masked_scores,
        pack_train_bits,
    )
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
    sel_b = jnp.asarray(
        np.asarray([ev._user_pos_index[int(u)] for u in users_np],
                   dtype=np.int32).reshape(n_batches, B)
    )
    pos_b = jnp.asarray(
        np.arange(n_batches * B, dtype=np.int32).reshape(n_batches, B)
    )
    factorized = model.eval_embeddings
    train_rows = ev._train_rows

    # global-plane packed bits for the batch-major user order
    I_p = num_items + ((-num_items) % 1024)
    pack = jax.jit(lambda rows: pack_train_bits(rows, num_items, I_p))
    parts = []
    for lo in range(0, len(users_np), B):
        parts.append(pack(train_rows[jnp.asarray(users_np[lo:lo + B])]))
    pre_bits = jnp.concatenate(parts, axis=0)  # (n, I_p/8) uint8
    pre_bits.block_until_ready()

    planes = jnp.arange(8, dtype=jnp.uint8)

    def xla_bits_masked(params, users, pos, pre):
        u_vecs, item_table = factorized(params, users)
        if I_p != num_items:
            item_table = jnp.pad(item_table, ((0, I_p - num_items), (0, 0)))
        scores = jnp.dot(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )                                               # (B, I_p)
        bits = pre[pos]                                 # (B, I_p/8)
        hit = (
            (bits[:, None, :] >> planes[None, :, None]) & jnp.uint8(1)
        ).reshape(bits.shape[0], I_p)                   # plane-major == item id
        return jnp.where(hit != 0, -jnp.inf, scores)[:, :num_items]

    def pallas_masked(params, users, sel, pre):
        u_vecs, item_table = factorized(params, users)
        return masked_scores(
            u_vecs.astype(jnp.float32), item_table.astype(jnp.float32),
            train_rows[users],
        )

    def scan_over(batch_fn, tail):
        def all_fn(params, users_b, sel_b, pre):
            def body(carry, xs):
                u, s = xs
                return carry + tail(batch_fn(params, u, s, pre)), None

            out, _ = jax.lax.scan(body, jnp.zeros(()), (users_b, sel_b))
            return out

        return jax.jit(all_fn)

    probe = lambda m: jnp.sum(m[:, ::512])

    def topk_tail(m):
        _, t = jax.lax.top_k(m, K)
        return jnp.sum(t)

    variants = {
        "pallas today": (scan_over(pallas_masked, probe), sel_b),
        "xla bits fused": (scan_over(xla_bits_masked, probe), pos_b),
        "pallas today + topk": (scan_over(pallas_masked, topk_tail), sel_b),
        "xla bits fused + topk": (scan_over(xla_bits_masked, topk_tail), pos_b),
    }

    # exactness
    a = variants["pallas today"][0](params, users_b, sel_b, pre_bits)
    b = variants["xla bits fused"][0](params, users_b, pos_b, pre_bits)
    assert float(a) == float(b), (float(a), float(b))
    a = variants["pallas today + topk"][0](params, users_b, sel_b, pre_bits)
    b = variants["xla bits fused + topk"][0](params, users_b, pos_b, pre_bits)
    assert float(a) == float(b), (float(a), float(b))
    print("exactness OK", flush=True)

    for f, arg in variants.values():
        np.asarray(f(params, users_b, arg, pre_bits))
    times = {n: [] for n in variants}
    for r in range(rounds):
        for name, (f, arg) in variants.items():
            t0 = time.perf_counter()
            # np.asarray, not block_until_ready: the latter can return
            # before the tunneled queue drains (CLAUDE.md), under-timing
            np.asarray(f(params, users_b, arg, pre_bits))
            times[name].append(round(time.perf_counter() - t0, 4))
        print("round %d done" % r, flush=True)

    results = {"meta": {"users": int(n_batches * B), "num_items": num_items,
                        "K": K}, "variants": {}}
    print()
    for name, ts in times.items():
        results["variants"][name] = {
            "rounds_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
        }
        print("%-24s min %.4fs  median %.4fs" % (
            name, min(ts), sorted(ts)[len(ts) // 2]))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
