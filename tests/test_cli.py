"""Entry-point smoke test: neurec_tpu.run.main with a properties file + CLI
overrides (the reference's `python main.py --recommender=X --k=v` flow)."""

import numpy as np

from neurec_tpu.run import main
from tests.helpers import make_synthetic_dataset


def _write_confs(tmp_path, epochs=2, verbose=2):
    make_synthetic_dataset(tmp_path)
    (tmp_path / "NeuRec.properties").write_text(
        "[default]\n"
        "recommender=MF\n"
        "config_dir=%s\n" % tmp_path
        + "data.input.path=%s\n" % tmp_path
        + "data.input.dataset=synth\n"
        "data.column.format=UIRT\n"
        "data.convert.separator='\\t'\n"
        "user_min=0\n"
        "item_min=0\n"
        "splitter=ratio\n"
        "ratio=0.8\n"
        "by_time=True\n"
        "metric=[\"Recall\", \"NDCG\"]\n"
        "topk=[10, 20]\n"
        "group_view=None\n"
        "rec.evaluate.neg=0\n"
        "test_batch_size=64\n"
        "num_thread=8\n"
    )
    (tmp_path / "MF.properties").write_text(
        "[hyperparameters]\n"
        "epochs=%d\nbatch_size=128\nembedding_size=8\nreg_mf=0.0\n" % epochs
        + "learning_rate=0.05\nlearner=adam\nnum_negatives=1\n"
        "is_pairwise=True\nloss_function=bpr\ninit_method=normal\n"
        "stddev=0.01\nverbose=%d\n" % verbose
    )


def test_cli_main(tmp_path, monkeypatch):
    _write_confs(tmp_path)
    monkeypatch.chdir(tmp_path)
    trainer, result = main(
        str(tmp_path / "NeuRec.properties"),
        cmd_args=["--epochs=2"],
    )
    vals = [float(x) for x in result.split("\t")]
    assert len(vals) == 4 and all(np.isfinite(vals))


def test_cli_checkpoint_resume(tmp_path, monkeypatch):
    """--ckpt_dir wires periodic orbax checkpoints + auto-resume: re-running
    the same command continues from the last saved epoch (elastic restart)."""
    _write_confs(tmp_path, verbose=100)
    monkeypatch.chdir(tmp_path)
    ckpt = tmp_path / "ckpts"

    tr1, _ = main(
        str(tmp_path / "NeuRec.properties"),
        cmd_args=["--epochs=2", "--ckpt_dir=%s" % ckpt, "--verbose=2"],
    )
    assert tr1._ckpt.latest_epoch() == 2
    tr1._ckpt.close()

    # same command, longer budget: must resume at epoch 3, not restart
    tr2, result = main(
        str(tmp_path / "NeuRec.properties"),
        cmd_args=["--epochs=4", "--ckpt_dir=%s" % ckpt, "--verbose=4"],
    )
    assert tr2._start_epoch == 3
    assert tr2._ckpt.latest_epoch() == 4
    tr2._ckpt.close()
    vals = [float(x) for x in result.split("\t")]
    assert len(vals) == 4 and all(np.isfinite(vals))
