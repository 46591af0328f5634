"""Sequential family: smoke + learning tests (time-order sampled models)."""

import jax
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


SEQ_PROPS = {
    "FPMC": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8, "reg_mf": 0.01,
        "learning_rate": 0.01, "learner": "adam", "is_pairwise": "True",
        "num_neg": 2, "loss_function": "bpr", "init_method": "uniform",
        "stddev": 0.01, "verbose": 3,
    },
    "FPMCplus": {
        "epochs": 3, "batch_size": 128, "embedding_size": 8,
        "weight_size": 8, "high_order": 3, "reg_mf": 0.00001,
        "reg_w": 0.001, "learning_rate": 0.01, "learner": "adam",
        "is_pairwise": "True", "num_neg": 2, "loss_function": "BPR",
        "embed_init_method": "tnormal", "weight_init_method": "he_normal",
        "stddev": 0.01, "verbose": 3,
    },
    "HRM": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8, "reg_mf": 0,
        "topK": 10, "learning_rate": 0.01, "learner": "adam",
        "pre_agg": "max", "session_agg": "max", "high_order": 2,
        "num_neg": 2, "loss_function": "cross_entropy",
        "init_method": "normal", "stddev": 0.01, "verbose": 3,
    },
    "NPE": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8, "reg": 0.01,
        "learning_rate": 0.01, "learner": "adam", "high_order": 3,
        "num_neg": 2, "loss_function": "cross_entropy",
        "init_method": "tnormal", "stddev": 0.01, "verbose": 3,
    },
    "SASRec": {
        "lr": 0.01, "l2_emb": 0.0, "hidden_units": 16, "dropout_rate": 0.2,
        "max_len": 12, "num_blocks": 2, "num_heads": 2, "batch_size": 32,
        "epochs": 3, "verbose": 3,
    },
    "GRU4Rec": {
        "lr": 0.01, "reg": 0.0, "layers": "[16]", "batch_size": 16,
        "loss": "top1", "hidden_act": "tanh", "final_act": "linear",
        "epochs": 3, "verbose": 3,
    },
    "GRU4RecPlus": {
        "lr": 0.01, "reg": 0.0, "bpr_reg": 1.0, "layers": "[16]",
        "batch_size": 16, "loss": "bpr_max", "hidden_act": "tanh",
        "final_act": "linear", "n_sample": 32, "sample_alpha": 0.75,
        "epochs": 3, "verbose": 3,
    },
    "Caser": {
        "lr": 0.01, "l2_reg": 0.001, "factors_num": 16, "seq_L": 4,
        "seq_T": 2, "nv": 2, "nh": 4, "dropout": 0.3, "neg_samples": 2,
        "batch_size": 64, "epochs": 3, "verbose": 3,
    },
    "SRGNN": {
        "lr": 0.01, "L2": 1e-5, "hidden_size": 16, "batch_size": 32,
        "epochs": 3, "lr_dc": 0.1, "lr_dc_step": 3, "step": 1,
        "nonhybrid": "False", "max_seq_len": 20, "verbose": 3,
    },
    "TransRec": {
        "epochs": 3, "batch_size": 256, "embedding_size": 8, "reg_mf": 0.0,
        "learning_rate": 0.01, "learner": "adam", "is_pairwise": "True",
        "num_neg": 2, "loss_function": "bpr", "init_method": "tnormal",
        "stddev": 0.01, "verbose": 3,
    },
}


@pytest.fixture(scope="module")
def seq_dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("seq")
    make_synthetic_dataset(tmp_path, num_users=50, num_items=60)
    return tmp_path


@pytest.mark.parametrize("name", sorted(SEQ_PROPS))
def test_sequential_model_smoke(seq_dataset, name):
    conf = make_config(seq_dataset, recommender=name, alg_props=SEQ_PROPS[name])
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
    result = trainer.evaluate()
    assert len(result.split("\t")) == 10


def test_fpmc_learns(seq_dataset):
    props = dict(SEQ_PROPS["FPMC"], epochs=25, learning_rate=0.05, verbose=25)
    conf = make_config(seq_dataset, recommender="FPMC", alg_props=props)
    dataset = Dataset(conf)
    model = get_model("FPMC")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.12, "FPMC NDCG@10=%.4f" % raw[2, 0]


def test_sasrec_learns(seq_dataset):
    props = dict(SEQ_PROPS["SASRec"], epochs=20, lr=0.01, verbose=20,
                 dropout_rate=0.1)
    conf = make_config(seq_dataset, recommender="SASRec", alg_props=props)
    dataset = Dataset(conf)
    model = get_model("SASRec")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.10, "SASRec NDCG@10=%.4f" % raw[2, 0]
