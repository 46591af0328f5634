"""Entry point: ``python -m neurec_tpu.run --recommender=MF [--k=v ...]``.

Parity with the reference main.py:10-45: fixed seeds, properties + CLI
config, dataset load, model resolution by name, train. The TF session and
GPU selection are replaced by JAX device discovery (TPU by default) and an
optional ('data','model') mesh.
"""

from __future__ import annotations

import random

import numpy as np

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.logging import run_logger
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer
from neurec_tpu.parallel.mesh import make_mesh


def main(properties: str = "NeuRec.properties", cmd_args=None):
    np.random.seed(2018)
    random.seed(2018)

    conf = Config(properties, default_section="hyperparameters", cmd_args=cmd_args)
    dataset = Dataset(conf)
    model_cls = get_model(conf["recommender"])
    model = model_cls(dataset, conf)

    mesh = None
    n_model = conf.get("mesh.model_axis", 1)
    import jax

    if len(jax.devices()) > 1 or n_model > 1:
        mesh = make_mesh(n_model=n_model)

    logger = run_logger(conf, dataset.dataset_name)
    logger.info(str(dataset))
    trainer = Trainer(model, dataset, conf, mesh=mesh, logger=logger)

    # --ckpt_dir=<dir> [--ckpt_every=N]: periodic orbax checkpoints with
    # auto-resume — re-running the same command after a crash/preemption
    # continues from the last saved epoch (elastic across mesh shapes: the
    # restore lands on the current run's shardings, see checkpoint.py).
    ckpt_dir = conf.get_raw("ckpt_dir", None) or None
    if ckpt_dir:
        from neurec_tpu.checkpoint import attach_to_trainer

        start = attach_to_trainer(
            trainer, str(ckpt_dir), every=int(conf.get("ckpt_every", 1))
        )
        logger.info(
            "checkpointing to %s every %d epoch(s); starting at epoch %d"
            % (ckpt_dir, trainer._ckpt_every, start)
        )

    try:
        result = trainer.train()
    finally:
        # release orbax background resources in long-lived processes
        ckpt = getattr(trainer, "_ckpt", None)
        if ckpt is not None:
            ckpt.close()
    return trainer, result


if __name__ == "__main__":
    main()
