"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Each process addresses 4 virtual CPU devices; the global mesh spans all 8.
Runs MF end-to-end — sharded init, two jitted epochs, full on-device eval —
and prints the resulting metric matrix as JSON for the parent to compare.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    workdir = sys.argv[3]

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

    conf = Config(os.path.join(workdir, "NeuRec.properties"), cmd_args=[])
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(model, dataset, conf, mesh=mesh, logger=SilentLogger())
    trainer.initialize()
    key = jax.random.PRNGKey(11)
    for e in range(2):
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.fold_in(key, e),
            jnp.int32(e + 1),
        )
        assert np.isfinite(float(loss))
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    print("RESULT%d %s" % (rank, json.dumps(np.asarray(raw).tolist())), flush=True)


if __name__ == "__main__":
    main()
