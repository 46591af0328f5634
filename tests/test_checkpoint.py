"""Checkpoint/resume: save -> crash -> restore mid-training continues."""

import numpy as np

from neurec_tpu.checkpoint import CheckpointManager, attach_to_trainer
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer
from tests.helpers import make_config, make_synthetic_dataset


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


PROPS = {
    "epochs": 4, "batch_size": 128, "embedding_size": 8, "reg_mf": 0.0,
    "learning_rate": 0.05, "learner": "adam", "num_negatives": 1,
    "is_pairwise": "True", "loss_function": "bpr",
    "init_method": "normal", "stddev": 0.01, "verbose": 4,
}


def _trainer(tmp_path, epochs):
    conf = make_config(tmp_path, recommender="MF",
                       alg_props=dict(PROPS, epochs=epochs))
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    return Trainer(model, dataset, conf, logger=SilentLogger())


def test_save_restore_roundtrip(tmp_path):
    make_synthetic_dataset(tmp_path)
    tr = _trainer(tmp_path, 2)
    tr.initialize()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, tr.params, tr.opt_state)
    import jax

    p2, o2, epoch = mgr.restore(
        jax.tree.map(np.asarray, tr.params),
        jax.tree.map(np.asarray, tr.opt_state),
    )
    assert epoch == 1
    np.testing.assert_array_equal(
        np.asarray(tr.params["user_emb"]), np.asarray(p2["user_emb"])
    )
    mgr.close()


def test_resume_continues_training(tmp_path):
    make_synthetic_dataset(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt2")

    # run 1: train 2 epochs (of 4), checkpointing each epoch
    tr1 = _trainer(tmp_path, 2)
    attach_to_trainer(tr1, ckpt_dir, every=1)
    tr1.train()
    assert tr1._ckpt.latest_epoch() == 2
    tr1._ckpt.close()

    # run 2: fresh trainer resumes at epoch 3
    tr2 = _trainer(tmp_path, 4)
    start = attach_to_trainer(tr2, ckpt_dir, every=1)
    assert start == 3
    # restored params equal run-1 finals
    np.testing.assert_allclose(
        np.asarray(tr1.params["user_emb"]),
        np.asarray(tr2.params["user_emb"]),
        rtol=1e-6,
    )
    tr2.train()
    assert tr2._ckpt.latest_epoch() == 4
    tr2._ckpt.close()


def test_sharded_save_restore_across_mesh_shapes(tmp_path):
    """Save under a (4,2) mesh; restore under (2,4) and single-device.

    Restored params must land on each target's own shardings (no silent
    fall-back to replicated/host placement) and keep exact values; resuming
    training from the restore must continue without loss blow-up.
    """
    import jax
    import jax.numpy as jnp

    from neurec_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    make_synthetic_dataset(tmp_path, num_users=60, num_items=80)
    ckpt_dir = str(tmp_path / "ckpt_mesh")

    # train 2 epochs on the (4,2) mesh and checkpoint
    conf = make_config(tmp_path, recommender="MF", alg_props=dict(PROPS, epochs=2))
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    tr1 = Trainer(model, dataset, conf, mesh=make_mesh(n_data=4, n_model=2),
                  logger=SilentLogger())
    tr1.initialize()
    key = jax.random.PRNGKey(5)
    for e in range(2):
        tr1.params, tr1.opt_state, loss1 = tr1._epoch_fn(
            tr1.params, tr1.opt_state, jax.random.fold_in(key, e), jnp.int32(e + 1)
        )
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(2, tr1.params, tr1.opt_state)
    mgr.close()
    want = np.asarray(tr1.params["item_emb"])

    for mesh in (make_mesh(n_data=2, n_model=4), None):
        model2 = get_model("MF")(dataset, conf)
        tr2 = Trainer(model2, dataset, conf, mesh=mesh, logger=SilentLogger())
        start = attach_to_trainer(tr2, ckpt_dir, every=1)
        assert start == 3
        np.testing.assert_array_equal(np.asarray(tr2.params["item_emb"]), want)
        if mesh is not None:
            spec = tr2.params["item_emb"].sharding.spec
            assert tuple(spec) == ("model", None), spec
        # resume one more epoch on the new topology: finite, sane loss
        tr2.params, tr2.opt_state, loss2 = tr2._epoch_fn(
            tr2.params, tr2.opt_state, jax.random.fold_in(key, 2), jnp.int32(3)
        )
        assert np.isfinite(float(loss2))
        assert float(loss2) <= float(loss1) * 1.5
        tr2._ckpt.close()
