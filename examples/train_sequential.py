"""Sequential example: SASRec on ml-100k (time-ordered next-item protocol).

Sequential models need the time-ordered interaction stream; the dataset's
default ratio split keeps timestamps, and the Trainer builds the per-epoch
sequence windows on device. Swap SASRec for GRU4Rec / Caser / SRGNN /
FPMC / TransRec etc. — same three lines.

Run from the repo root:  python examples/train_sequential.py
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
    cmd_args=[
        "--recommender=SASRec",
        "--epochs=20",
        "--verbose=10",
        "--by_time=True",   # time-ordered split, the protocol SASRec expects
    ],
)
dataset = Dataset(conf)
print(dataset)

model = get_model("SASRec")(dataset, conf)
trainer = Trainer(model, dataset, conf)
result = trainer.train()
print("final:", result)
