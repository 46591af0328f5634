"""Batch-serve top-10 recommendations for every user to a TSV.

Train MF briefly, then export `user \t item:score ...` lines — the job a
production pipeline runs after training. Items/users are reported in the
ORIGINAL raw ids (the dataset's dense remapping is inverted on the way out).

Run from the repo root:  python examples/export_topk.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.recommend import batch_topk
from neurec_tpu.trainer import Trainer

conf = Config(
    "NeuRec.properties",
    default_section="hyperparameters",
    cmd_args=["--recommender=MF", "--epochs=20", "--verbose=20"],
)
dataset = Dataset(conf)
model = get_model("MF")(dataset, conf)
trainer = Trainer(model, dataset, conf)
trainer.train()

items, scores = batch_topk(
    model, trainer.params, k=10, train_matrix=dataset.train_matrix
)

inv_user = {v: k for k, v in dataset.userids.items()}
inv_item = {v: k for k, v in dataset.itemids.items()}
out = "recs_top10.tsv"
with open(out, "w") as f:
    for u in range(items.shape[0]):
        recs = " ".join(
            "%s:%.4f" % (inv_item[int(i)], s)
            for i, s in zip(items[u], scores[u])
        )
        f.write("%s\t%s\n" % (inv_user[u], recs))
print("wrote %s (%d users x 10 items)" % (out, items.shape[0]))
print("first line:", open(out).readline().strip()[:100])
