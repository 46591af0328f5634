"""Checkpoint/resume example: kill this script mid-run and re-run it —
training continues from the last saved epoch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurec_tpu.checkpoint import attach_to_trainer
from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer

conf = Config(
    "NeuRec.properties",
    default_section="hyperparameters",
    cmd_args=["--recommender=MF", "--epochs=50", "--verbose=10"],
)
dataset = Dataset(conf)
model = get_model("MF")(dataset, conf)
trainer = Trainer(model, dataset, conf)

start = attach_to_trainer(trainer, "checkpoints/mf_ml100k", every=5)
print("starting from epoch", start)
trainer.train()
