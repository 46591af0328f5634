"""Attribute the gowalla LightGCN train step by epoch-level ablation.

VERDICT r3 weak #3: ~1/3 of the ~9.6 ms step was unattributed. The
profiler's trace viewer is unavailable through the tunneled chip, but
whole-epoch timings are reliable (CLAUDE.md), so this driver builds one
trainer per ABLATION in a single process and interleaves epochs:

  full          — production step (baseline)
  no_spmm       — n_layers=0: removes the 2*K propagation SpMMs
  no_sampling   — sample_negatives stubbed to a constant (timing only;
                  the math changes, the data flow does not)
  sgd           — learner=gd instead of adam (optimizer premium)
  base          — all three ablations at once (residual floor)

Differences vs 'full' attribute each component; 'base' shows how much is
irreducible batch machinery (permutation, gathers, BPR fwd/bwd, scan).

Writes benchmarks/step_attrib.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from benchmarks.gowalla_northstar import LIGHTGCN_GOWALLA_ARGS, ensure_local_copy

OUT = os.path.join(REPO, "benchmarks", "step_attrib.json")


class _SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 10

    import jax
    import jax.numpy as jnp

    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    ensure_local_copy()

    real_sampler = trainer_mod.sample_negatives

    def stub_sampler(key, rows, num_items, shape):
        # timing-only ablation: same output shape/dtype, no rejection loop
        return jnp.zeros(rows.shape[0], jnp.int32) + jnp.int32(1)

    ABLATIONS = {
        "full": {},
        "no_spmm": {"n_layers": 0},
        "no_sampling": {"stub_sampler": True},
        "sgd": {"learner": "gd"},
        "base": {"n_layers": 0, "stub_sampler": True, "learner": "gd"},
    }

    def build(abl):
        args = [
            "--recommender=LightGCN",
            "--data.input.path=%s" % os.path.join(REPO, "dataset"),
            "--data.input.dataset=gowalla",
            "--data.column.format=UI",
            "--data.convert.separator=','",
            "--splitter=ratio", "--ratio=0.8", "--by_time=False",
            "--epochs=1", "--topk=[20]", "--metric=[\"Recall\",\"NDCG\"]",
            "--test_batch_size=2048",
        ] + LIGHTGCN_GOWALLA_ARGS
        if "n_layers" in abl:
            args = [a for a in args if not a.startswith("--n_layers")]
            args.append("--n_layers=%d" % abl["n_layers"])
        if "learner" in abl:
            args.append("--learner=%s" % abl["learner"])
        conf = Config(os.path.join(REPO, "NeuRec.properties"),
                      default_section="hyperparameters", cmd_args=args)
        dataset = Dataset(conf)
        model = get_model("LightGCN")(dataset, conf)
        tr = Trainer(model, dataset, conf, logger=_SilentLogger())
        trainer_mod.sample_negatives = (
            stub_sampler if abl.get("stub_sampler") else real_sampler
        )
        try:
            tr.initialize()
            key = jax.random.PRNGKey(0)
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, key, jnp.int32(1)
            )
            jax.block_until_ready(tr.params)
        finally:
            trainer_mod.sample_negatives = real_sampler
        return tr

    trainers = {}
    key = jax.random.PRNGKey(2018)
    for name, abl in ABLATIONS.items():
        t0 = time.perf_counter()
        trainers[name] = build(abl)
        print("built+compiled %s in %.0fs" % (name, time.perf_counter() - t0),
              flush=True)

    for tr in trainers.values():  # warm ramp
        for e in range(2):
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, e),
                jnp.int32(2),
            )
        jax.block_until_ready(tr.params)

    times = {n: [] for n in trainers}
    for r in range(rounds):
        for name, tr in trainers.items():
            t0 = time.perf_counter()
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, 100 + r),
                jnp.int32(3 + r),
            )
            jax.block_until_ready(tr.params)
            times[name].append(round(time.perf_counter() - t0, 4))
        print("round %d done" % r, flush=True)

    steps = -(-trainers["full"].dataset.train_matrix.nnz // 2048)
    results = {"protocol": "interleaved whole-epoch ablations, min over "
               "%d rounds; steps/epoch=%d" % (rounds, steps),
               "ablations": {}}
    print()
    mins = {}
    for name, ts in times.items():
        mins[name] = min(ts)
        results["ablations"][name] = {
            "epochs_s": ts, "min_s": min(ts),
            "median_s": sorted(ts)[len(ts) // 2],
            "ms_per_step_min": round(min(ts) / steps * 1e3, 3),
        }
        print("%-12s min %.4fs/epoch (%.2f ms/step)  median %.4fs"
              % (name, min(ts), min(ts) / steps * 1e3,
                 sorted(ts)[len(ts) // 2]))
    attrib = {
        "spmm_ms_per_step": round((mins["full"] - mins["no_spmm"]) / steps * 1e3, 3),
        "sampling_ms_per_step": round((mins["full"] - mins["no_sampling"]) / steps * 1e3, 3),
        "adam_premium_ms_per_step": round((mins["full"] - mins["sgd"]) / steps * 1e3, 3),
        "base_ms_per_step": round(mins["base"] / steps * 1e3, 3),
    }
    results["attribution"] = attrib
    print(json.dumps(attrib, indent=1))

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
