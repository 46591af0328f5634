"""Minimal end-to-end example: MF/BPR on ml-100k.

Equivalent of the reference's tutorial.ipynb walkthrough
(Configurator -> Dataset -> model -> train -> evaluate).
Run from the repo root:  python examples/train_mf.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer

conf = Config(
    "NeuRec.properties",
    default_section="hyperparameters",
    cmd_args=["--recommender=MF", "--epochs=20", "--verbose=5"],
)
dataset = Dataset(conf)
print(dataset)

model = get_model("MF")(dataset, conf)
trainer = Trainer(model, dataset, conf)
result = trainer.train()
print("final:", result)
