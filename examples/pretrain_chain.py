"""Pretrain warm-start chain: GMF + MLP -> NeuMF (He et al., NCF paper flow).

The reference consumes pretrain pickles but can't produce them (its save
code is commented out, FISM.py:146-149); here `save_pretrain` exports each
consumer's exact layout. The same pattern warm-starts NAIS/DeepICF from
FISM (`--pretrain_file`), ConvNCF and NGCF from MF.

Run from the repo root:  python examples/pretrain_chain.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.pretrain import save_pretrain
from neurec_tpu.trainer import Trainer


def run(model_name, *cmd):
    conf = Config(
        "NeuRec.properties",
        default_section="hyperparameters",
        cmd_args=["--recommender=%s" % model_name, *cmd],
    )
    dataset = Dataset(conf)
    model = get_model(model_name)(dataset, conf)
    trainer = Trainer(model, dataset, conf)
    trainer.train()
    return trainer.params


# 1. pretrain GMF (pointwise MF) and MLP towers, matching NeuMF's dims
gmf_params = run("MF", "--epochs=10", "--verbose=10", "--embedding_size=16",
                 "--is_pairwise=False", "--loss_function=cross_entropy")
save_pretrain("GMF", gmf_params, "pretrained/ml100k_gmf.pkl")

mlp_params = run("MLP", "--epochs=10", "--verbose=10", "--layers=[64,32,16]")
save_pretrain("MLP", mlp_params, "pretrained/ml100k_mlp.pkl")

# 2. NeuMF warm-started from both (logs "load pretrained params successful!")
run("NeuMF", "--epochs=10", "--verbose=10",
    "--mf_pretrain=pretrained/ml100k_gmf.pkl",
    "--mlp_pretrain=pretrained/ml100k_mlp.pkl")
