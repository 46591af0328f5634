"""End-to-end vertical slice: MF/BPR on a synthetic dataset.

Checks the whole stack — Dataset -> padded structures -> jitted epoch with
fused on-device sampling -> on-device evaluator — and that learning actually
happens (NDCG@10 well above the random-ranking baseline).
"""

import os

import numpy as np
import pytest

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer
from tests.helpers import make_config, make_synthetic_dataset


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mf")
    make_synthetic_dataset(tmp_path)
    conf = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 30,
            "batch_size": 256,
            "embedding_size": 16,
            "reg_mf": 0.01,
            "learning_rate": 0.05,
            "learner": "adam",
            "num_negatives": 1,
            "is_pairwise": "True",
            "loss_function": "bpr",
            "init_method": "normal",
            "stddev": 0.01,
            "verbose": 30,
        },
    )
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    return trainer


def test_mf_learns(trained):
    raw = trained.evaluator.evaluator.evaluate_raw(
        trained.model.predict, trained.params
    )
    # metric order: Precision, Recall, NDCG, MAP, MRR @ [10, 20]
    ndcg10 = raw[2, 0]
    # random ranking on this dataset scores NDCG@10 ~ 0.05; block structure
    # is easy, trained model should be far above
    assert ndcg10 > 0.15, "NDCG@10=%.4f — model failed to learn" % ndcg10


def test_loss_decreases(trained):
    # retrain a couple of epochs from scratch tracking loss
    import jax

    trainer = trained
    model = trainer.model
    trainer2 = Trainer(model, trainer.dataset, trainer.config, logger=SilentLogger())
    trainer2.initialize()
    key = jax.random.PRNGKey(0)
    losses = []
    for e in range(8):
        trainer2.params, trainer2.opt_state, loss = trainer2._epoch_fn(
            trainer2.params, trainer2.opt_state, jax.random.fold_in(key, e), e + 1
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_pointwise_mf(tmp_path):
    make_synthetic_dataset(tmp_path)
    conf = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 10,
            "batch_size": 256,
            "embedding_size": 16,
            "reg_mf": 0.0,
            "learning_rate": 0.05,
            "learner": "adam",
            "num_negatives": 2,
            "is_pairwise": "False",
            "loss_function": "cross_entropy",
            "init_method": "normal",
            "stddev": 0.01,
            "verbose": 10,
        },
    )
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    result = trainer.train()
    assert len(result.split("\t")) == 10  # 5 metrics x 2 ks
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.10


def test_trace_dir_writes_device_trace(tmp_path):
    """--trace_dir captures a jax.profiler trace of the whole run."""
    make_synthetic_dataset(tmp_path, num_users=20, num_items=30)
    trace_dir = str(tmp_path / "trace")
    conf = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 1, "batch_size": 64, "embedding_size": 4,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.01, "verbose": 1,
        },
        trace_dir=trace_dir,
    )
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    trainer = Trainer(model, ds, conf, logger=SilentLogger())
    trainer.train()
    found = []
    for root, _, files in os.walk(trace_dir):
        found += [f for f in files if f.endswith((".pb", ".json.gz"))]
    assert found, "no trace artifacts under %s" % trace_dir
