"""Pretrain warm-start chain: export pickles (pretrain.py) -> consumer
models pick them up in init_params.

Mirrors the reference's chain (NeuMF.py:106-121, NAIS/DeepICF
pretrain_file, ConvNCF.py:148-163, NGCF.py:255-266, IRGAN generator
pickle) — whose *save* side is commented out (FISM.py:146-149);
`neurec_tpu.pretrain.save_pretrain` completes it.
"""

import jax
import numpy as np
import pytest

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.pretrain import load_pretrain, save_pretrain
from tests.helpers import make_config, make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pretrain")
    make_synthetic_dataset(tmp_path, num_users=30, num_items=40)
    conf = make_config(tmp_path, recommender="MF")
    return tmp_path, Dataset(conf), conf


def _model(name, dataset, tmp_path, **props):
    conf = make_config(tmp_path, recommender=name, alg_props=props)
    return get_model(name)(dataset, conf)


def test_mf_to_neumf_warm_start(tiny):
    tmp_path, dataset, _ = tiny
    key = jax.random.PRNGKey(0)

    mf = _model("MF", dataset, tmp_path, embedding_size=8)
    mf_params = mf.init_params(key)
    save_pretrain("MF", mf_params, str(tmp_path / "mf.pkl"))

    mlp = _model("MLP", dataset, tmp_path, layers="[16,8]")
    mlp_params = mlp.init_params(key)
    save_pretrain("MLP", mlp_params, str(tmp_path / "mlp.pkl"))

    neumf = _model(
        "NeuMF", dataset, tmp_path, embedding_size=8, layers="[16,8]",
        mf_pretrain=str(tmp_path / "mf.pkl"),
        mlp_pretrain=str(tmp_path / "mlp.pkl"),
    )
    params = neumf.init_params(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(params["mf_user"], mf_params["user_emb"])
    np.testing.assert_array_equal(params["mf_item"], mf_params["item_emb"])
    np.testing.assert_array_equal(params["mlp_user"], mlp_params["mlp_user"])
    np.testing.assert_array_equal(params["mlp_item"], mlp_params["mlp_item"])


def test_fism_to_nais_and_deepicf(tiny):
    tmp_path, dataset, _ = tiny
    fism = _model("FISM", dataset, tmp_path, embedding_size=8, alpha=0.5)
    fism_params = fism.init_params(jax.random.PRNGKey(1))
    save_pretrain("FISM", fism_params, str(tmp_path / "fism.pkl"))
    assert len(load_pretrain(str(tmp_path / "fism.pkl"))) == 3

    for name in ("NAIS", "DeepICF"):
        model = _model(
            name, dataset, tmp_path, embedding_size=8, weight_size=8,
            algorithm=0, alpha=0.5, beta=0.5,
            pretrain_file=str(tmp_path / "fism.pkl"),
        )
        params = model.init_params(jax.random.PRNGKey(9))
        np.testing.assert_array_equal(params["Q_set"], fism_params["Q_set"])
        np.testing.assert_array_equal(params["Q"], fism_params["Q"])
        np.testing.assert_array_equal(params["bias"], fism_params["bias"])


def test_mf_to_convncf_and_ngcf(tiny):
    tmp_path, dataset, _ = tiny
    mf = _model("MF", dataset, tmp_path, embedding_size=8)
    mf_params = mf.init_params(jax.random.PRNGKey(2))
    save_pretrain("MF", mf_params, str(tmp_path / "mf8.pkl"))

    convncf = _model(
        "ConvNCF", dataset, tmp_path, embedding_size=8,
        net_channel="[4,4,4]", mf_pretrain=str(tmp_path / "mf8.pkl"),
    )
    params = convncf.init_params(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(params["embedding_P"], mf_params["user_emb"])
    np.testing.assert_array_equal(params["embedding_Q"], mf_params["item_emb"])

    ngcf = _model(
        "NGCF", dataset, tmp_path, embedding_size=8, layer_size="[8,8]",
        pretrain_file=str(tmp_path / "mf8.pkl"),
    )
    params = ngcf.init_params(jax.random.PRNGKey(4))
    np.testing.assert_array_equal(params["user_emb"], mf_params["user_emb"])
    np.testing.assert_array_equal(params["item_emb"], mf_params["item_emb"])


def test_irgan_generator_layout(tiny):
    tmp_path, dataset, _ = tiny
    irgan = _model("IRGAN", dataset, tmp_path, factors_num=8, epochs=1)
    gan_params = irgan.init_params(jax.random.PRNGKey(5))
    save_pretrain("IRGAN", gan_params, str(tmp_path / "gen.pkl"))

    warm = _model(
        "IRGAN", dataset, tmp_path, factors_num=8, epochs=1,
        pretrain_file=str(tmp_path / "gen.pkl"),
    )
    params = warm.init_params(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(
        params["gen"]["user_emb"], gan_params["gen"]["user_emb"]
    )
    np.testing.assert_array_equal(
        params["gen"]["item_bias"], gan_params["gen"]["item_bias"]
    )


def test_missing_files_fall_back_to_random(tiny):
    tmp_path, dataset, _ = tiny
    neumf = _model(
        "NeuMF", dataset, tmp_path, embedding_size=8, layers="[16,8]",
        mf_pretrain=str(tmp_path / "nope.pkl"), mlp_pretrain="",
    )
    params = neumf.init_params(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(params["mf_user"])))

    with pytest.raises(ValueError):
        save_pretrain("NoSuchModel", {}, str(tmp_path / "x.pkl"))
