"""Functional model protocol + registry.

The reference gives every model a TF session, a graph-building method and a
hand-written train loop (model/AbstractRecommender.py:38-45 and 33 nearly
identical ``train_model`` copies). Here a model is a *pure description*:

* ``init_params(rng) -> params``   — a pytree of arrays;
* ``predict(params, users) -> (B, num_items)`` — full-catalog scores,
  jit-traceable (the evaluator jits it);
* ``loss(params, batch, weights) -> scalar`` — per-batch training loss,
  jit-traceable; ``batch`` keys depend on ``data_kind``:
    - "pairwise":        users, pos_items, neg_items
    - "pointwise":       users, items, labels
    - "time_pairwise":   users, recent_items, pos_items, neg_items
    - "time_pointwise":  users, recent_items, items, labels
    - "dense_row":       users, rows (B, num_items float)
  ``weights`` masks padded instances (1 real / 0 pad).

A single Trainer (neurec_tpu/trainer.py) owns sampling, the optimizer, the
epoch loop and evaluation for every model.
"""

from __future__ import annotations

from typing import Dict, Optional, Type

import jax.numpy as jnp


class Recommender:
    """Base class: hyperparameter capture + protocol stubs."""

    data_kind: str = "pairwise"
    # models whose samplers need time-ordered user dicts (SeqAbstractRecommender)
    needs_time: bool = False

    def __init__(self, dataset, config):
        self.num_users = dataset.num_users
        self.num_items = dataset.num_items
        self.batch_size = int(config.get("batch_size", 512))
        self.epochs = int(config.get("epochs", 100))
        self.verbose = int(config.get("verbose", 1))
        self.learner = config.get("learner", "adam")
        self.learning_rate = float(config.get("learning_rate", config.get("lr", 0.001)))
        self.num_negatives = int(config.get("num_negatives", 1))

    # -- protocol ----------------------------------------------------------
    def init_params(self, rng):
        raise NotImplementedError

    def predict(self, params, users) -> jnp.ndarray:
        raise NotImplementedError

    def loss(self, params, batch: Dict[str, jnp.ndarray], weights) -> jnp.ndarray:
        raise NotImplementedError

    def on_mesh(self, mesh):
        """Hook: the Trainer announces its device mesh before jitting.

        Models holding device-resident side structures (graph adjacencies,
        padded history tables) override this to re-place them onto the mesh
        (e.g. LightGCN/NGCF shard their COO adjacency into per-device row
        blocks). Default: nothing to re-place.
        """
        return None

    def param_shardings(self, mesh):
        """Pytree of NamedSharding matching ``init_params``' structure.

        Default: tensor parallelism is opt-OUT. Every parameter leaf with
        ndim >= 2 whose leading dimension is an id-vocabulary size
        (num_users / num_items, their +1 padded-row variants, or the
        num_users+num_items stacked-graph size) is row-sharded over the
        'model' mesh axis — XLA turns lookups into ID-partitioned gather
        exchanges and full-catalog scoring into a column-sharded matmul.
        Everything else (dense towers, biases) replicates.

        JAX requires evenly divisible explicit shardings, so a vocab table
        whose leading dim does not divide the 'model' axis size falls back
        to replicated for that leaf. Models with bespoke layouts override.
        Returns None (leave placement to XLA) if the parameter shapes
        cannot be inferred without data (e.g. shapes depending on host
        preprocessing that resists abstract evaluation).
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            shapes = jax.eval_shape(self.init_params, jax.random.PRNGKey(0))
        except Exception:
            return None
        n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
        vocab = {
            self.num_users,
            self.num_items,
            self.num_users + 1,
            self.num_items + 1,
            self.num_users + self.num_items,
        }

        def spec(leaf):
            if (
                getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[0] in vocab
                and n_model > 1
                and leaf.shape[0] % n_model == 0
            ):
                return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
            return NamedSharding(mesh, P())

        return jax.tree.map(spec, shapes)

    # models whose full-catalog scores factor as ``u_vecs @ item_table.T``
    # define ``eval_embeddings(params, users) -> (u_vecs, item_table)`` so the
    # evaluator can fuse scoring + train-item masking in one Pallas pass
    # (neurec_tpu/eval/evaluator.py). ``_affine_eval`` folds a per-item bias
    # into that form by appending a constant-1 column to the user vectors.
    @staticmethod
    def _affine_eval(u_vecs, item_table, item_bias=None):
        if item_bias is None:
            return u_vecs, item_table
        ones = jnp.ones((u_vecs.shape[0], 1), u_vecs.dtype)
        return (
            jnp.concatenate([u_vecs, ones], axis=1),
            jnp.concatenate(
                [item_table, item_bias[:, None].astype(item_table.dtype)], axis=1
            ),
        )


_REGISTRY: Dict[str, Type[Recommender]] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.name = name
        return cls
    return deco


def get_model(name: str) -> Type[Recommender]:
    """Resolve a model class by name, importing model families lazily.

    Mirrors main.py:30-40's importlib probing of
    model.{general,social,sequential}_recommender.<name>.
    """
    if name not in _REGISTRY:
        import importlib

        for family in ("general", "sequential", "social"):
            try:
                importlib.import_module("neurec_tpu.models." + family)
            except ImportError:
                pass
    if name not in _REGISTRY:
        raise ImportError("Recommender '%s' is not found" % name)
    return _REGISTRY[name]


def registered_models():
    # import all families so the listing is complete
    import importlib

    for family in ("general", "sequential", "social"):
        try:
            importlib.import_module("neurec_tpu.models." + family)
        except ImportError:
            pass
    return sorted(_REGISTRY)
