"""End-to-end sampled-negatives protocol: rec.evaluate.neg > 0 drives
Dataset negative sampling + the evaluator's candidate path through training."""

import os

import numpy as np

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer
from tests.helpers import make_config, make_synthetic_dataset


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def test_training_with_sampled_negative_eval(tmp_path):
    make_synthetic_dataset(tmp_path, num_users=40, num_items=60)
    conf = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 2, "batch_size": 128, "embedding_size": 8,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.01, "verbose": 2,
        },
        **{"rec.evaluate.neg": 20},
    )
    dataset = Dataset(conf)
    assert dataset.negative_matrix is not None
    neg_dict = dataset.get_user_test_neg_dict()
    train_dict = dataset.get_user_train_dict()
    test_dict = dataset.get_user_test_dict()
    # sampled negatives avoid the user's full interaction history
    for u, negs in neg_dict.items():
        assert len(negs) == 20
        assert not set(negs) & (set(train_dict.get(u, ())) | set(test_dict.get(u, ())))
    # the .neg20 cache file was written next to the split cache
    cache_dir = os.path.join(str(tmp_path), "_tmp_synth")
    assert any(f.endswith(".neg20") for f in os.listdir(cache_dir))

    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    result = trainer.train()
    vals = [float(x) for x in result.split("\t")]
    assert len(vals) == 10 and all(np.isfinite(vals))

    # grouped evaluation over the candidate protocol also works
    conf2 = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 1, "batch_size": 128, "embedding_size": 8,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.01, "verbose": 1,
        },
        **{"rec.evaluate.neg": 20, "group_view": "[10, 20, 50]"},
    )
    dataset2 = Dataset(conf2)
    model2 = get_model("MF")(dataset2, conf2)
    trainer2 = Trainer(model2, dataset2, conf2, logger=SilentLogger())
    out = trainer2.train()
    assert all("]:" in ln for ln in out.strip().split("\n"))
