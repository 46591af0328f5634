"""Multi-chip example: LightGCN on a ('data','model') mesh.

On a single host with N chips this shards the batch over 'data' and the
embedding tables over 'model'; the same code runs on one chip (mesh of
size 1). To simulate without hardware:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_sharded.py
(note: under the axon tunnel, also jax.config.update("jax_platforms","cpu"))
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.parallel.mesh import make_mesh
from neurec_tpu.trainer import Trainer

conf = Config(
    "NeuRec.properties",
    default_section="hyperparameters",
    cmd_args=["--recommender=LightGCN", "--epochs=5", "--verbose=5"],
)
dataset = Dataset(conf)
model = get_model("LightGCN")(dataset, conf)

n = len(jax.devices())
mesh = make_mesh(n_model=2 if n % 2 == 0 and n > 1 else 1)
print("mesh:", mesh)

trainer = Trainer(model, dataset, conf, mesh=mesh)
print("final:", trainer.train())
