"""neurec_tpu — a TPU-native recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of wubinzzu/NeuRec
(reference layout surveyed in SURVEY.md):

* config system with ini + CLI override parity (``neurec_tpu.config``,
  reference: util/configurator.py)
* dataset pipeline: load / filter / split / remap / cache
  (``neurec_tpu.data``, reference: data/dataset.py, data/utils.py)
* on-device negative sampling fused into jitted train steps
  (``neurec_tpu.ops.sampling``, replacing util/cython/random_choice.pyx)
* fully on-device ranking evaluator: batched score + top-k + vectorized
  cumulative metrics (``neurec_tpu.eval``, replacing the reference's
  C++ thread-pool backend evaluator/backend/cpp)
* a functional model zoo sharing a single Trainer
  (``neurec_tpu.models``, ``neurec_tpu.trainer``)
* multi-chip sharding via jax.sharding.Mesh (``neurec_tpu.parallel``)
"""

__version__ = "0.1.0"

from neurec_tpu.config import Config  # noqa: F401
