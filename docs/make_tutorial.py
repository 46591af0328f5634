"""Generate + execute tutorial.ipynb (parity with the reference's
tutorial.ipynb, the de-facto API walkthrough: Configurator -> Dataset ->
model -> evaluate on ml-100k).

Run from the repo root: python docs/make_tutorial.py
Executes each code cell in-process (on whatever jax platform is live) and
embeds the captured stdout, so the notebook ships with real outputs.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import nbformat as nbf

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.chdir(_REPO)  # Config/Dataset paths are repo-root relative

MD = "markdown"
CODE = "code"

CELLS = [
    (MD, """\
# neurec_tpu tutorial

A walkthrough of the framework's public API on ml-100k — configuration,
dataset pipeline, training, and full-catalog ranking evaluation. This is
the same tour the reference's `tutorial.ipynb` gives (Configurator ->
Dataset -> Logger -> MF -> evaluate), on the TPU-native stack: one jitted
epoch per model, on-device negative sampling, on-device evaluator.

Everything below also works from the CLI:

```bash
python main.py --recommender=MF --epochs=30 --verbose=10
```
"""),
    (MD, """\
## 1. Configuration

Two-level ini config with CLI-style overrides, exactly like the reference:
`NeuRec.properties` holds the global options (dataset, splitter, metrics,
top-k), `conf/<Model>.properties` holds the model's hyperparameters, and
`--key=value` arguments override both (priority: cmd > model conf > global).
"""),
    (CODE, """\
from neurec_tpu.config import Config

conf = Config(
    "NeuRec.properties",
    default_section="hyperparameters",
    cmd_args=["--recommender=MF", "--epochs=30", "--verbose=10"],
)
print("model:   ", conf.recommender)
print("dataset: ", conf["data.input.dataset"])
print("run id:  ", conf.params_str()[:80], "...")\
"""),
    (MD, """\
## 2. Dataset

Loads `ml-100k.rating` (UIRT), filters by `user_min`/`item_min`, splits
per-user by ratio/loo/given, densely remaps ids, and caches the split
artifacts keyed by the md5 of the source file — re-running reuses the
cache. Matrices are scipy CSR of shape (users, items).
"""),
    (CODE, """\
from neurec_tpu.data.dataset import Dataset

dataset = Dataset(conf)
print(dataset)
print("train nnz:", dataset.train_matrix.nnz, " test nnz:", dataset.test_matrix.nnz)\
"""),
    (MD, """\
## 3. Model + Trainer

A model is a pure description — `init_params(rng)`, `loss(params, batch,
weights)`, `predict(params, users)` — and one shared `Trainer` drives every
model: it fuses shuffling, negative sampling, embedding updates and the
optimizer into a single jitted `lax.scan` epoch, and runs the on-device
evaluator every `verbose` epochs. (First call pays the XLA compile; the
epochs themselves are milliseconds.)
"""),
    (CODE, """\
from neurec_tpu.models import get_model
from neurec_tpu.trainer import Trainer

model = get_model(conf.recommender)(dataset, conf)
trainer = Trainer(model, dataset, conf)
result = trainer.train()\
"""),
    (MD, """\
## 4. Recommending

`predict(params, users)` returns full-catalog scores. Mask what the user
already consumed and take a top-k:
"""),
    (CODE, """\
import jax.numpy as jnp
import numpy as np

user = 42
scores = np.array(model.predict(trainer.params, jnp.asarray([user])))[0]
seen = dataset.train_matrix[user].indices
scores[seen] = -np.inf
top10 = np.argsort(-scores)[:10]
print("top-10 items for user %d:" % user, top10.tolist())\
"""),
    (MD, """\
## 5. Evaluation protocol

The evaluator scores every test user against the full catalog on device
(train items masked to -inf), ranks with `lax.top_k`, and computes
cumulative Precision/Recall/MAP/NDCG/MRR@1..max(topk) — the reference's
C++ thread-pool evaluator collapsed into one XLA dispatch. A
`group_view=[g1, g2, ...]` config buckets users by train-interaction count
and reports one line per bucket; `rec.evaluate.neg=N` switches to the
sampled-negatives protocol.
"""),
    (CODE, """\
print(trainer.evaluator.metrics_info())
print(trainer.evaluate())\
"""),
    (MD, """\
## Going further

* **Checkpoint/resume** (the reference has none): `examples/checkpointed_training.py` —
  orbax-backed params + optimizer state + epoch.
* **Pretrain warm-start chain**: `neurec_tpu.pretrain.save_pretrain("MF", trainer.params, "pretrained/mf.pkl")`,
  then `python main.py --recommender=NeuMF --mf_pretrain=pretrained/mf.pkl --mlp_pretrain=...`.
* **Multi-chip**: pass a mesh — the same code runs on 1 chip or a pod slice,
  with embedding tables row-sharded over the `model` axis:

```python
from neurec_tpu.parallel.mesh import make_mesh
trainer = Trainer(model, dataset, conf, mesh=make_mesh(n_model=2))
```

* **The full zoo**: `python main.py --recommender=<any of the 35>` — see
  `docs/parity.md` for the model list and `benchmarks/RESULTS.md` for
  measured quality/throughput.
"""),
]


def main():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    ns: dict = {}
    n_exec = 0
    for kind, src in CELLS:
        if kind == MD:
            nb.cells.append(nbf.v4.new_markdown_cell(src))
            continue
        n_exec += 1
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, "<tutorial cell %d>" % n_exec, "exec"), ns)
        cell = nbf.v4.new_code_cell(src, execution_count=n_exec)
        text = buf.getvalue()
        if text:
            cell.outputs = [
                nbf.v4.new_output("stream", name="stdout", text=text)
            ]
        nb.cells.append(cell)
        sys.stderr.write("cell %d done\n" % n_exec)
    out = os.path.join(os.path.dirname(__file__), "..", "tutorial.ipynb")
    with open(out, "w") as f:
        nbf.write(nb, f)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
