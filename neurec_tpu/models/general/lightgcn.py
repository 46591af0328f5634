"""LightGCN — K-layer linear propagation over the normalized interaction
graph (He et al., SIGIR 2020). The flagship graph model.

Parity with model/general_recommender/LightGCN.py:16-192:

* adjacency types plain/norm/gcmc/pre (+ mean fallback), LightGCN.py:34-78;
* propagation E^{k+1} = Â E^k for K layers, final embedding = mean over
  [E^0..E^K] (LightGCN.py:132-149);
* BPR loss sum(softplus(neg - pos)) + reg * l2(EGO embeddings of the batch)
  (LightGCN.py:156-166) — regularization is on the layer-0 tables;
* eval scores = propagated u_emb @ propagated item table^T.

TPU-first: propagation is a device-resident COO segment-sum SpMM inside the
jitted train step (ops/graph.py) instead of TF's host-built SparseTensor;
tables row-shard over the 'model' mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.graph import build_norm_adjacency, spmm
from neurec_tpu.ops.losses import l2_loss, log_loss


@register("LightGCN")
class LightGCN(Recommender):
    data_kind = "pairwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.learning_rate = float(config.get("lr", config.get("learning_rate", 0.01)))
        self.reg = float(config.get("reg", 1e-3))
        self.emb_dim = int(config.get("embed_size", 64))
        self.n_layers = int(config.get("n_layers", 3))
        self.adj_type = config.get("adj_type", "pre")
        self.adj = build_norm_adjacency(dataset.train_matrix, self.adj_type)
        # graph_shard=auto|on|off: row-block-shard the adjacency over the
        # 'data' mesh axis (docs/parallelism.md large-graph layout)
        self.graph_shard = str(config.get("graph_shard", "auto")).lower()
        self._adj_sharded = None
        self._mesh = None

    def on_mesh(self, mesh):
        from neurec_tpu.ops.graph import maybe_shard

        self._adj_sharded = maybe_shard(self.adj, mesh, self.graph_shard)
        self._mesh = mesh

    def init_params(self, rng):
        xavier = jax.nn.initializers.glorot_uniform()
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier(ku, (self.num_users, self.emb_dim)),
            "item_emb": xavier(ki, (self.num_items, self.emb_dim)),
        }

    def propagate(self, params):
        """K-layer propagation; returns (user_table, item_table)."""
        from neurec_tpu.ops.graph import spmm_sharded

        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = ego
        h = ego
        for _ in range(self.n_layers):
            if self._adj_sharded is not None:
                h = spmm_sharded(self._adj_sharded, h, self._mesh)
            else:
                h = spmm(self.adj, h)
            acc = acc + h
        final = acc / (self.n_layers + 1)
        return final[: self.num_users], final[self.num_users :]

    def loss(self, params, batch, weights):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        u_table, i_table = self.propagate(params)
        u = u_table[users]
        pi = i_table[pos]
        ni = i_table[neg]
        y = jnp.sum(u * pi, axis=-1) - jnp.sum(u * ni, axis=-1)
        mf_loss = jnp.sum(log_loss(y) * weights)
        w = weights[:, None]
        emb_loss = self.reg * l2_loss(
            params["user_emb"][users] * w,
            params["item_emb"][pos] * w,
            params["item_emb"][neg] * w,
        )
        return mf_loss + emb_loss

    def predict(self, params, users):
        u_table, i_table = self.propagate(params)
        return u_table[users] @ i_table.T

    def eval_embeddings(self, params, users):
        """Factorized eval form for the fused Pallas score+mask kernel."""
        u_table, i_table = self.propagate(params)
        return u_table[users], i_table

    def eval_tables(self, params):
        """User-independent tables: lets the evaluator hoist the K-layer
        propagation out of its per-batch scan (XLA does not hoist the
        loop-invariant SpMM chain itself)."""
        return self.propagate(params)
