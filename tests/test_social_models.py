"""Social family: SBPR + DiffNet smoke tests with a synthetic social graph."""

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


def _make_social_file(tmp_path, num_users=50, seed=0):
    rng = np.random.RandomState(seed)
    path = tmp_path / "social.uu"
    with open(path, "w") as f:
        for u in range(num_users):
            friends = rng.choice(num_users, size=4, replace=False)
            for v in friends:
                if v != u:
                    f.write("%d\t%d\n" % (u, v))
    return path


@pytest.fixture(scope="module")
def social_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("social")
    make_synthetic_dataset(tmp_path, num_users=50, num_items=60)
    social = _make_social_file(tmp_path, num_users=50)
    return tmp_path, str(social)


PROPS = {
    "SBPR": lambda social: {
        "learning_rate": 0.05, "embedding_size": 8, "learner": "adam",
        "loss_function": "bpr", "num_epochs": 3, "reg_mf": 0.01,
        "batch_size": 128, "social_file": social, "init_method": "normal",
        "stddev": 0.01, "verbose": 3,
    },
    "DiffNet": lambda social: {
        "epochs": 3, "batch_size": 128, "embedding_size": 8,
        "reg_mf": 0.00001, "learning_rate": 0.05, "learner": "adam",
        "num_negatives": 2, "ispairwise": "False", "loss_function": "BPR",
        "init_method": "normal", "stddev": 0.01,
        "user_feature_file": "none", "item_feature_file": "none",
        "feature_dimension": 16, "social_file": social, "verbose": 3,
    },
}


@pytest.mark.parametrize("name", sorted(PROPS))
def test_social_model_smoke(social_setup, name):
    tmp_path, social = social_setup
    conf = make_config(tmp_path, recommender=name, alg_props=PROPS[name](social))
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


def test_sbpr_learns(social_setup):
    tmp_path, social = social_setup
    props = dict(PROPS["SBPR"](social), num_epochs=20, verbose=20)
    conf = make_config(tmp_path, recommender="SBPR", alg_props=props)
    dataset = Dataset(conf)
    model = get_model("SBPR")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.12, "SBPR NDCG@10=%.4f" % raw[2, 0]
