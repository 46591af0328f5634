"""Smoke + learning tests across the model zoo.

Every registered model must: initialize, run a few jitted epochs with finite
decreasing loss, produce (B, num_items) predictions, and run the full
evaluator. Flagship-quality thresholds live in dedicated tests.
"""

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


MODEL_PROPS = {
    "MF": {
        "epochs": 3, "batch_size": 128, "embedding_size": 8, "reg_mf": 0.01,
        "learning_rate": 0.05, "learner": "adam", "num_negatives": 1,
        "is_pairwise": "True", "loss_function": "bpr",
        "init_method": "normal", "stddev": 0.01, "verbose": 3,
    },
    "MLP": {
        "epochs": 3, "batch_size": 128, "layers": "[16,8]", "reg_mlp": 0.0,
        "learning_rate": 0.01, "learner": "adam", "num_neg": 2,
        "is_pairwise": "True", "loss_function": "bpr",
        "init_method": "normal", "stddev": 0.01, "verbose": 3,
    },
    "NeuMF": {
        "epochs": 3, "batch_size": 128, "embedding_size": 8,
        "layers": "[16,8]", "reg_mf": 0.0, "reg_mlp": 0.0,
        "learning_rate": 0.01, "learner": "adam", "num_neg": 2,
        "is_pairwise": "False", "loss_function": "cross_entropy",
        "init_method": "normal", "stddev": 0.01, "verbose": 3,
        "mf_pretrain": "", "mlp_pretrain": "",
    },
    "Pop": {"epochs": 0, "batch_size": 128, "verbose": 1},
    "APR": {
        "epochs": 3, "batch_size": 128, "embedding_size": 8, "reg": 0,
        "reg_adv": 1, "learning_rate": 0.05, "learner": "adam",
        "adv_epoch": 0, "adv": "grad", "eps": 0.5, "adver": 1,
        "init_method": "tnormal", "stddev": 0.01, "verbose": 3,
    },
    "ConvNCF": {
        "epochs": 3, "batch_size": 128, "embedding_size": 8,
        "regs": "[0.01,0,0]", "net_channel": "[8,8,8]", "lr_embed": 0.05,
        "lr_net": 0.05, "num_negatives": 2, "loss_function": "BPR",
        "keep": 0.9, "embed_init_method": "tnormal",
        "weight_init_method": "xavier_normal", "stddev": 0.01, "verbose": 3,
    },
    "DMF": {
        "epochs": 3, "batch_size": 128, "reg_mf": 0, "layers": "[32,16]",
        "learning_rate": 0.01, "loss_function": "cross_entropy",
        "learner": "adam", "num_negatives": 2, "init_method": "normal",
        "stddev": 0.01, "verbose": 3,
    },
    "WRMF": {
        "epochs": 3, "embedding_size": 8, "reg_mf": 0.1, "alpha": 10,
        "init_method": "uniform", "stddev": 0.01, "verbose": 3,
    },
    "CFGAN": {
        "reg_G": 0.001, "reg_D": 0.0, "lr_G": 0.001, "lr_D": 0.001,
        "ZR_ratio": 0.5, "ZP_ratio": 0.5, "ZR_coefficient": 0.03,
        "hiddenLayer_G": "[16]", "hiddenLayer_D": "[8]",
        "batchSize_G": 16, "batchSize_D": 16, "step_G": 1, "step_D": 1,
        "mode": "userBased", "opt_G": "adam", "opt_D": "adam",
        "epochs": 3, "verbose": 3,
    },
    "ItemKNN": {
        "neighbor": 5, "shrink": 0, "similarity": "cosine",
        "asymmetric_alpha": 1, "tversky_alpha": 0.5, "tversky_beta": 0.5,
        "verbose": 1,
    },
    "JCA": {
        "hidden_neuron": 16, "epochs": 3, "f_act": "tanh", "g_act": "tanh",
        "batch_size": 32, "reg": 0, "learning_rate": 0.01,
        "corruption_level": 0.2, "learner": "adam", "margin": 0.15,
        "num_neg": 1, "init_method": "tnormal", "stddev": 0.01, "verbose": 3,
    },
    "IRGAN": {
        "lr": 0.01, "factors_num": 8, "batch_size": 64, "epochs": 3,
        "d_epoch": 1, "g_epoch": 1, "g_reg": 0.0, "d_reg": 0.00625,
        "d_tau": 0.2, "pretrain_file": "None", "verbose": 3,
    },
    "MultiVAE": {
        "epochs": 3, "batch_size": 32, "p_dim": "[8,16]", "reg": 0.0,
        "learning_rate": 0.01, "learner": "adam", "activation": "tanh",
        "anneal_cap": 0.2, "total_anneal_steps": 20,
        "weight_init_method": "xavier_normal", "bias_init_method": "tnormal",
        "stddev": 0.01, "verbose": 3,
    },
    "MultiDAE": {
        "epochs": 3, "batch_size": 32, "p_dim": "[8,16]", "reg": 0.0,
        "learning_rate": 0.01, "learner": "adam", "activation": "tanh",
        "weight_init_method": "xavier_normal", "bias_init_method": "tnormal",
        "stddev": 0.01, "verbose": 3,
    },
    "DAE": {
        "epochs": 3, "batch_size": 32, "hidden_neuron": 16,
        "h_act": "sigmoid", "g_act": "sigmoid", "reg": 0.0,
        "learning_rate": 0.01, "learner": "adam", "corruption_level": 0.1,
        "init_method": "normal", "stddev": 0.01, "verbose": 3,
    },
    "CDAE": {
        "epochs": 3, "batch_size": 32, "hidden_dim": 16, "lr": 0.01,
        "reg": 0.001, "dropout": 0.5, "num_neg": 2,
        "hidden_act": "sigmoid", "loss_func": "sigmoid_cross_entropy",
        "learner": "adam", "verbose": 3,
    },
}


@pytest.fixture(scope="module")
def zoo_dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("zoo")
    make_synthetic_dataset(tmp_path)
    return tmp_path


@pytest.mark.parametrize("name", sorted(MODEL_PROPS))
def test_model_smoke(zoo_dataset, name):
    conf = make_config(zoo_dataset, recommender=name, alg_props=MODEL_PROPS[name])
    dataset = Dataset(conf)
    model = get_model(name)(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.initialize()

    if model.data_kind != "none" and model.epochs > 0:
        key = jax.random.PRNGKey(0)
        losses = []
        for e in range(3):
            trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
                trainer.params, trainer.opt_state, jax.random.fold_in(key, e), e + 1
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        if name not in ("IRGAN", "CFGAN"):  # adversarial losses oscillate
            assert losses[-1] <= losses[0], losses

    import jax.numpy as jnp

    preds = trainer.model.predict(trainer.params, jnp.arange(5, dtype=jnp.int32))
    assert preds.shape == (5, dataset.num_items)
    assert np.isfinite(np.asarray(preds)).all()

    assert_eval_embeddings_parity(model, trainer.params)
    result = trainer.evaluate()
    assert len(result.split("\t")) == 10


def test_multivae_learns(zoo_dataset):
    props = dict(MODEL_PROPS["MultiVAE"], epochs=40, learning_rate=0.01)
    conf = make_config(zoo_dataset, recommender="MultiVAE", alg_props=props)
    dataset = Dataset(conf)
    model = get_model("MultiVAE")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    assert raw[2, 0] > 0.12, "MultiVAE NDCG@10=%.4f" % raw[2, 0]


def test_irgan_discriminator_pad_slots_carry_no_weight(tmp_path):
    """The D sub-epoch pads its flat instance array to a batch multiple by
    aliasing slot 0; those slots must train with weight 0 (review r5: they
    trained the first user's first positive with full weight). With a
    single step the batch gradient is an order-independent sum, so a
    batch_size == N run and a padded batch_size > N run from the same key
    must produce the same updated discriminator."""
    import jax

    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=10, num_items=24,
                           min_items=4, max_items=7)
    base = {"lr": 0.01, "factors_num": 8, "epochs": 1, "d_epoch": 1,
            "g_epoch": 1, "g_reg": 0.0, "d_reg": 0.00625, "d_tau": 0.2,
            "pretrain_file": "None", "verbose": 1}

    def d_pass_with_batch(batch_size):
        conf = make_config(tmp_path, recommender="IRGAN",
                           alg_props=dict(base, batch_size=batch_size))
        ds = Dataset(conf)
        model = get_model("IRGAN")(ds, conf)
        params = model.init_params(jax.random.PRNGKey(0))
        new_params, _ = model._d_pass(params, jax.random.PRNGKey(7))
        return model, new_params["dis"]

    model, _ = d_pass_with_batch(512)  # probe N
    n_flat = int(model._train_users.shape[0]) * 2 * model.L
    assert n_flat < 512, "fixture must fit one batch"

    _, dis_exact = d_pass_with_batch(n_flat)       # no pad slots
    _, dis_padded = d_pass_with_batch(n_flat + 64)  # 64 pad slots

    for k in dis_exact:
        np.testing.assert_allclose(
            np.asarray(dis_exact[k]), np.asarray(dis_padded[k]),
            rtol=2e-5, atol=1e-7, err_msg=k,
        )
