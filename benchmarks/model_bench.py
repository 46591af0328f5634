"""Per-model steady-state training throughput on ml-100k (real TPU chip).

Completes the BASELINE.md measurement matrix: MF and LightGCN are covered by
bench.py; this script measures the remaining flagship configs —

    NeuMF    (pointwise log-loss, num_negatives negatives)  examples/s/chip
    MultiVAE (dense user rows)                               users/s/chip
    SASRec   (2 blocks, 1 head, max_len 50)                  sequences/s/chip

Each model runs its shipped conf/<Model>.properties hyperparameters with the
reference's default ml-100k split (NeuRec.properties). Steady state follows
the CLAUDE.md warm-up rule (~8 post-compile executions before timing).

Run:  python benchmarks/model_bench.py [--epochs 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def bench_model(name, n_epochs):
    import jax

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    cmd = ["--recommender=%s" % name]
    conf = Config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "NeuRec.properties"),
        default_section="hyperparameters",
        cmd_args=cmd,
    )
    dataset = Dataset(conf)
    model = get_model(name)(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=_SilentLogger())
    trainer.initialize()

    # instances processed per epoch, in the model's natural unit
    kind = model.data_kind
    if kind in ("pointwise", "time_pointwise"):
        per_epoch = dataset.train_matrix.nnz * (
            1 + getattr(model, "num_negatives", 1)
        )
        unit = "examples/s/chip"
    elif kind in ("pairwise", "time_pairwise"):
        per_epoch = dataset.train_matrix.nnz
        unit = "examples/s/chip"
    elif kind == "dense_row":
        per_epoch = len(trainer._users_flat)
        unit = "users/s/chip"
    elif kind == "custom":
        # sequence models expose their per-epoch instance count; fall back
        # to one instance per training interaction
        seqs = getattr(model, "_train_users", None)
        if seqs is not None:
            per_epoch = int(seqs.shape[0])
            unit = "sequences/s/chip"
        else:
            per_epoch = dataset.train_matrix.nnz
            unit = "examples/s/chip"
    else:
        raise ValueError("no unit defined for %s (data_kind=%s)" % (name, kind))

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for w in range(8):  # compile + warm-up
        trainer.params, trainer.opt_state, _ = trainer._epoch_fn(
            trainer.params, trainer.opt_state,
            jax.random.fold_in(key, 100 + w), jax.numpy.int32(1),
        )
        jax.block_until_ready(trainer.params)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for e in range(n_epochs):
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state,
            jax.random.fold_in(key, e), jax.numpy.int32(e + 1),
        )
    jax.block_until_ready(trainer.params)
    dt = time.perf_counter() - t0
    return {
        "model": name,
        "throughput": round(per_epoch * n_epochs / dt, 1),
        "unit": unit,
        "epoch_ms": round(dt / n_epochs * 1000, 2),
        "per_epoch_instances": int(per_epoch),
        "compile_warmup_s": round(compile_s, 1),
        "final_loss": round(float(loss), 5),
    }


OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "model_bench.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--models", default="NeuMF,MultiVAE,SASRec")
    args = ap.parse_args()

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in args.models.split(","):
        rec = bench_model(name.strip(), args.epochs)
        print(json.dumps(rec), flush=True)
        results[rec["model"]] = rec
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
