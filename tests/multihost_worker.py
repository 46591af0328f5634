"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Each process addresses 4 virtual CPU devices; the global mesh spans all 8.
jax.distributed can only initialize once per process, so ONE worker pair
covers every requested model (argv[3] is a JSON spec file listing
``{"name", "workdir", "epochs", "grouped"}`` entries — one per epoch-builder
category: pairwise MF, dense_row MultiVAE, custom SASRec). For each model it
runs sharded init, jitted epochs and the full on-device eval, printing

    RESULT<rank>:<name> <raw metric matrix as JSON>
    GROUPED<rank>:<name> <grouped-evaluator result string as JSON>   (opt.)

for the parent to compare across ranks and against the single-process
oracle.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    spec_path = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from neurec_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(
        coordinator_address="127.0.0.1:%s" % port,
        num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    from neurec_tpu.config import Config
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.parallel.mesh import make_mesh
    from neurec_tpu.trainer import Trainer

    class SilentLogger:
        def info(self, msg):
            pass

        debug = warning = error = critical = info

    with open(spec_path) as f:
        spec = json.load(f)

    mesh = make_mesh(n_data=4, n_model=2)
    for entry in spec:
        name, workdir = entry["name"], entry["workdir"]
        tag = entry.get("tag", name)
        # per-entry env knobs (e.g. forcing the item-sharded eval merge);
        # read lazily at eval trace time so setting them here is effective.
        # Prior values are saved and restored after the entry.
        saved_env = {k: os.environ.get(k) for k in entry.get("env", {})}
        for k, v in entry.get("env", {}).items():
            os.environ[k] = v
        conf = Config(os.path.join(workdir, "NeuRec.properties"), cmd_args=[])
        dataset = Dataset(conf)
        model = get_model(name)(dataset, conf)
        trainer = Trainer(model, dataset, conf, mesh=mesh,
                          logger=SilentLogger())
        trainer.initialize()
        key = jax.random.PRNGKey(11)
        for e in range(entry["epochs"]):
            trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
                trainer.params, trainer.opt_state, jax.random.fold_in(key, e),
                jnp.int32(e + 1),
            )
            assert np.isfinite(float(loss))
        if entry.get("grouped"):
            # group_view configs dispatch to GroupedEvaluator (string API)
            grouped = trainer.evaluator.evaluate(model.predict, trainer.params)
            print(
                "GROUPED%d:%s %s" % (rank, tag, json.dumps(grouped)),
                flush=True,
            )
        else:
            raw = trainer.evaluator.evaluator.evaluate_raw(
                model.predict, trainer.params
            )
            print(
                "RESULT%d:%s %s"
                % (rank, tag, json.dumps(np.asarray(raw).tolist())),
                flush=True,
            )
        for k, old in saved_env.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old


if __name__ == "__main__":
    main()
