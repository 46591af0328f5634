"""Pretrain pickle export/import — completes the reference's warm-start chain.

The reference chains warm-starts through pickle files: NeuMF loads GMF/MLP
``[user_emb, item_emb]`` pairs (model/general_recommender/NeuMF.py:106-121),
NAIS/DeepICF load a FISM ``[c1, embedding_Q, bias]`` triple
(NAIS.py / DeepICF.py ``pretrain_file``), IRGAN loads a generator pickle,
and ConvNCF/NGCF declare pretrain hooks. But every corresponding *save*
is commented out (e.g. FISM.py:146-149) or absent, so the chain cannot be
produced from inside the reference itself. These helpers complete it: each
saver emits exactly the pickle layout the consumer model expects, keyed by
the producing model's param names in this framework.

Usage::

    params = trainer.train()
    save_pretrain("MF", params, "pretrained/ml100k_mf.pkl")
    # then: python main.py --recommender=NeuMF --mf_pretrain=pretrained/...
"""

from __future__ import annotations

import logging
import os
import pickle
import sys

import numpy as np

log = logging.getLogger("neurec_tpu.pretrain")
if not log.handlers:
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(logging.Formatter("%(message)s"))
    log.addHandler(_handler)
    log.setLevel(logging.INFO)
    log.propagate = False

# model name -> param keys pickled, in the order the consumer indexes them
_LAYOUTS = {
    # NeuMF.mf_pretrain / ConvNCF.mf_pretrain / NGCF.pretrain_file
    "MF": ("user_emb", "item_emb"),
    "GMF": ("user_emb", "item_emb"),
    # NeuMF.mlp_pretrain
    "MLP": ("mlp_user", "mlp_item"),
    # NAIS.pretrain_file / DeepICF.pretrain_file ([c1, embedding_Q, bias])
    "FISM": ("Q_set", "Q", "bias"),
    # IRGAN.pretrain_file (generator [user_emb, item_emb, bias])
    "IRGAN": ("gen.user_emb", "gen.item_emb", "gen.item_bias"),
}


def _resolve(params, dotted):
    node = params
    for part in dotted.split("."):
        node = node[part]
    return node


def save_pretrain(model_name: str, params: dict, path: str) -> None:
    """Pickle the warm-start arrays of ``model_name`` in consumer layout."""
    try:
        keys = _LAYOUTS[model_name]
    except KeyError:
        raise ValueError(
            "no pretrain layout for %r (have: %s)"
            % (model_name, ", ".join(sorted(_LAYOUTS)))
        ) from None
    payload = [np.asarray(_resolve(params, k)) for k in keys]
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    with open(path, "wb") as fout:
        pickle.dump(payload, fout)


def load_pretrain(path: str):
    """Load a pretrain pickle (list of arrays)."""
    with open(path, "rb") as fin:
        return pickle.load(fin, encoding="utf-8")


def try_load(*paths):
    """Load pretrain pickles for a model's warm-start, logging the outcome
    like the reference does (NeuMF.py:118-121: "load pretrained params
    successful!/unsuccessful!").

    Returns a list of payloads (one per path) or None. Empty/unset paths
    mean pretrain is disabled — silent None, no "unsuccessful" noise.
    """
    if not paths or not all(paths):
        return None
    try:
        out = [load_pretrain(p) for p in paths]
    except Exception:
        # any unreadable/corrupt/incompatible pickle (incl. EOFError from
        # a truncated save and AttributeError from stale contents) falls
        # back to training from scratch, like the reference
        log.info("load pretrained params unsuccessful! (%s)" % ", ".join(paths))
        return None
    log.info("load pretrained params successful! (%s)" % ", ".join(paths))
    return out
