"""Item-set family: FISM, NAIS, DeepICF, Fossil smoke + learning."""

import jax
import numpy as np
import pytest

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer
from tests.helpers import (
    assert_eval_embeddings_parity,
    make_config,
    make_synthetic_dataset,
)


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


PROPS = {
    "FISM": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8,
        "regs": "[0.0001,0.0001]", "alpha": 0.5, "learning_rate": 0.05,
        "learner": "adam", "is_pairwise": "False", "num_neg": 2,
        "loss_function": "square", "init_method": "normal", "stddev": 0.01,
        "verbose": 3,
    },
    "NAIS": {
        "pretrain": 0, "verbose": 3, "learner": "adam", "batch_size": 256,
        "epochs": 3, "weight_size": 8, "embedding_size": 8, "data_alpha": 0,
        "regs": "[1e-7,1e-7,1e-5]", "alpha": 0, "beta": 0.5, "num_neg": 2,
        "learning_rate": 0.05, "activation": 0, "algorithm": 0,
        "is_pairwise": "False", "loss_function": "cross_entropy",
        "embed_init_method": "tnormal", "weight_init_method": "he_normal",
        "stddev": 0.01, "pretrain_file": "None",
    },
    "DeepICF": {
        "pretrain": 0, "verbose": 3, "learner": "adam", "batch_size": 256,
        "epochs": 3, "weight_size": 8, "embedding_size": 8,
        "layers": "[8,4]", "batch_norm": "True",
        "regs": "[1e-7,1e-7,1e-5]", "alpha": 0, "beta": 0.5, "num_neg": 2,
        "learning_rate": 0.05, "activation": 0, "algorithm": 0,
        "loss_function": "cross_entropy",
        "embed_init_method": "tnormal", "weight_init_method": "he_normal",
        "stddev": 0.01, "pretrain_file": "None",
    },
    "Fossil": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8,
        "regs": "[0.01,0.01,0.01]", "alpha": 0.5, "high_order": 2,
        "learning_rate": 0.05, "learner": "adam", "is_pairwise": "True",
        "num_neg": 2, "loss_function": "bpr", "init_method": "normal",
        "stddev": 0.01, "verbose": 3,
    },
}


@pytest.fixture(scope="module")
def itemset_dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("itemset")
    make_synthetic_dataset(tmp_path, num_users=40, num_items=50)
    return tmp_path


@pytest.mark.parametrize("name", sorted(PROPS))
def test_itemset_model_smoke(itemset_dataset, name):
    conf = make_config(itemset_dataset, recommender=name, alg_props=PROPS[name])
    dataset = Dataset(conf)
    model = get_model(name)(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.initialize()
    key = jax.random.PRNGKey(0)
    losses = []
    for e in range(3):
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.fold_in(key, e), e + 1
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] <= losses[0], losses
    assert_eval_embeddings_parity(model, trainer.params)
    result = trainer.evaluate()
    assert len(result.split("\t")) == 10


def test_fism_learns(itemset_dataset):
    props = dict(PROPS["FISM"], epochs=20, verbose=20)
    conf = make_config(itemset_dataset, recommender="FISM", alg_props=props)
    dataset = Dataset(conf)
    model = get_model("FISM")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.12, "FISM NDCG@10=%.4f" % raw[2, 0]
