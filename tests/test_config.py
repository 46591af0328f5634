import os

import pytest

from neurec_tpu.config import Config


@pytest.fixture
def config_files(tmp_path):
    lib = tmp_path / "NeuRec.properties"
    lib.write_text(
        "[default]\n"
        "recommender=MF\n"
        "config_dir=%s\n" % tmp_path
        + "topk=[10, 20]\n"
        "metric=[\"Precision\", \"Recall\"]\n"
        "group_view=None\n"
        "by_time=False\n"
        "user_min=0\n"
        "ratio=0.8\n"
    )
    alg = tmp_path / "MF.properties"
    alg.write_text(
        "[hyperparameters]\n"
        "learning_rate=0.001\n"
        "embedding_size=64\n"
        "is_pairwise=True\n"
        "loss_function=bpr\n"
    )
    return str(lib)


def test_value_coercion(config_files):
    conf = Config(config_files, cmd_args=[])
    assert conf["topk"] == [10, 20]
    assert conf["metric"] == ["Precision", "Recall"]
    assert conf["group_view"] is None
    assert conf["by_time"] is False
    assert conf["ratio"] == 0.8
    assert conf["user_min"] == 0
    assert conf["embedding_size"] == 64
    assert conf["is_pairwise"] is True
    assert conf["loss_function"] == "bpr"


def test_cmd_override(config_files):
    conf = Config(config_files, cmd_args=["--topk=[5]", "--embedding_size=8"])
    assert conf["topk"] == [5]
    assert conf["embedding_size"] == 8


def test_lookup_priority_lib_over_alg(tmp_path):
    lib = tmp_path / "lib.properties"
    lib.write_text("[default]\nrecommender=X\nconfig_dir=%s\nshared=1\n" % tmp_path)
    alg = tmp_path / "X.properties"
    alg.write_text("[hyperparameters]\nshared=2\nonly_alg=3\n")
    conf = Config(str(lib), cmd_args=[])
    assert conf["shared"] == 1  # lib wins over alg (configurator.py:116-127)
    assert conf["only_alg"] == 3


def test_attr_and_contains(config_files):
    conf = Config(config_files, cmd_args=[])
    assert conf.embedding_size == 64
    assert "topk" in conf
    assert "nonexistent" not in conf
    with pytest.raises(KeyError):
        conf["nonexistent"]


def test_params_str(config_files):
    conf = Config(config_files, cmd_args=[])
    s = conf.params_str()
    assert s.startswith("MF_")
    assert "learning_rate=0.001" in s


def test_single_section_any_name(tmp_path):
    lib = tmp_path / "l.properties"
    lib.write_text("[whatever]\nrecommender=Y\nconfig_dir=%s\n" % tmp_path)
    conf = Config(str(lib), default_section="default", cmd_args=[])
    assert conf["recommender"] == "Y"


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        Config("/nonexistent/path.properties", cmd_args=[])
