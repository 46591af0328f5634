"""Attribute the MF fused-epoch step (ml-100k, batch 512) by ablation.

ab_mf_unroll.json showed the ~62 us/step is NOT scan overhead; this
driver isolates the remaining candidates with the interleaved
whole-epoch protocol:

  full         — production pairwise step
  no_sampling  — sample_negatives stubbed (constant negative)
  sgd          — learner=gd (Adam's dense m/v table update premium)
  no_reg       — reg_mf=0 (drops the 3 extra embedding gathers of L2)
  base         — all ablations at once

Writes benchmarks/mf_step_attrib.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "benchmarks", "mf_step_attrib.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 8
    epochs_per = int(sys.argv[sys.argv.index("--epochs-per-round") + 1]) \
        if "--epochs-per-round" in sys.argv else 20

    import jax
    import jax.numpy as jnp

    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    real_sampler = trainer_mod.sample_negatives

    def stub_sampler(key, rows, num_items, shape):
        return jnp.zeros(rows.shape[0], jnp.int32) + jnp.int32(1)

    ABLATIONS = {
        "full": {},
        "no_sampling": {"stub_sampler": True},
        "sgd": {"learner": "gd"},
        "no_reg": {"reg_mf": 0.0},
        "base": {"stub_sampler": True, "learner": "gd", "reg_mf": 0.0},
    }

    dataset = None

    def build(abl):
        nonlocal dataset
        args = ["--recommender=MF", "--epochs=1", "--batch_size=512",
                "--topk=[20]", "--metric=[\"Recall\",\"NDCG\"]"]
        if "learner" in abl:
            args.append("--learner=%s" % abl["learner"])
        if "reg_mf" in abl:
            args.append("--reg_mf=%s" % abl["reg_mf"])
        conf = Config(os.path.join(REPO, "NeuRec.properties"),
                      default_section="hyperparameters", cmd_args=args)
        if dataset is None:
            dataset = Dataset(conf)
        model = get_model("MF")(dataset, conf)
        tr = Trainer(model, dataset, conf, logger=_SilentLogger())
        trainer_mod.sample_negatives = (
            stub_sampler if abl.get("stub_sampler") else real_sampler
        )
        try:
            tr.initialize()
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.PRNGKey(0), jnp.int32(1)
            )
            jax.block_until_ready(tr.params)
        finally:
            trainer_mod.sample_negatives = real_sampler
        return tr

    key = jax.random.PRNGKey(2018)
    trainers = {}
    for name, abl in ABLATIONS.items():
        t0 = time.perf_counter()
        trainers[name] = build(abl)
        print("built+compiled %s in %.0fs" % (name, time.perf_counter() - t0),
              flush=True)

    def run_epochs(tr, n, seed):
        t0 = time.perf_counter()
        for e in range(n):
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, seed + e),
                jnp.int32(2 + e),
            )
        jax.block_until_ready(tr.params)
        return time.perf_counter() - t0

    for tr in trainers.values():
        run_epochs(tr, 3, 1)

    times = {n: [] for n in trainers}
    for r in range(rounds):
        for name, tr in trainers.items():
            dt = run_epochs(tr, epochs_per, 100 + r * 50)
            times[name].append(round(dt / epochs_per, 5))
        print("round %d done" % r, flush=True)

    steps = -(-trainers["full"].dataset.train_matrix.nnz // 512)
    results = {"protocol": "interleaved, %d epochs per timing, min over %d "
               "rounds; steps/epoch=%d" % (epochs_per, rounds, steps),
               "ablations": {}}
    mins = {}
    print()
    for name, ts in times.items():
        mins[name] = min(ts)
        results["ablations"][name] = {
            "epochs_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
            "us_per_step_min": round(min(ts) / steps * 1e6, 2),
        }
        print("%-12s min %.5fs/epoch (%.1f us/step)  median %.5fs"
              % (name, min(ts), min(ts) / steps * 1e6,
                 sorted(ts)[len(ts) // 2]))
    results["attribution_us_per_step"] = {
        "sampling": round((mins["full"] - mins["no_sampling"]) / steps * 1e6, 2),
        "adam_premium": round((mins["full"] - mins["sgd"]) / steps * 1e6, 2),
        "l2_reg": round((mins["full"] - mins["no_reg"]) / steps * 1e6, 2),
        "base": round(mins["base"] / steps * 1e6, 2),
    }
    print(json.dumps(results["attribution_us_per_step"], indent=1))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
