"""NGCF — neural graph collaborative filtering (Wang et al., SIGIR 2019).

Parity with model/general_recommender/NGCF.py:16-366:

* adjacency: plain / norm (D^-1(A+I)) / gcmc (D^-1 A) / mean fallback
  (NGCF.py:298-317) over the bipartite graph;
* three propagation variants (NGCF.py:160-247):
  - ngcf: leaky_relu(Â E W_gc + b_gc) + leaky_relu((E ⊙ Â E) W_bi + b_bi),
    message dropout, per-layer L2-normalize, CONCAT of all layers;
  - gcn:  leaky_relu(Â E W_gc + b_gc), dropout, concat;
  - gcmc: extra per-layer dense W_mlp (layer-0 embedding NOT concatenated);
* BPR loss sum(softplus(neg-pos)) + reg * l2(PROPAGATED batch embeddings)
  (NGCF.py:93-110).

Deviations (documented): the reference's 100-fold sparse split
(NGCF.py:320-332) is a TF host-memory artifact — here the SpMM is one
device segment-sum; node/message dropout are applied only during training
(the reference bakes always-on tf.nn.dropout into the graph, active even at
eval, NGCF.py:193).

Pretrain: the reference declares a pretrained-embedding path
(`pre_train_data`, NGCF.py:43, 255-266) but never loads it from anywhere —
dead code. Here `pretrain_file` (a `[user_emb, item_emb]` pickle, the
`pretrain.py` MF layout) makes that capability reachable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.graph import SparseAdj, build_norm_adjacency, spmm
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss
from neurec_tpu.pretrain import try_load


def _l2norm(x, axis=1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


@register("NGCF")
class NGCF(Recommender):
    data_kind = "pairwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.emb_dim = int(config.get("embedding_size", 16))
        self.weight_size = list(config.get("layer_size", [16, 16]))
        self.n_layers = len(self.weight_size)
        self.reg = float(config.get("reg", 0.0))
        self.adj_type = config.get("adj_type", "norm")
        self.alg_type = config.get("alg_type", "ngcf")
        self.node_dropout_flag = bool(config.get("node_dropout_flag", False))
        self.node_dropout_ratio = float(config.get("node_dropout_ratio", 0.1))
        self.mess_dropout_ratio = float(config.get("mess_dropout_ratio", 0.1))
        self.embed_init_method = config.get("embed_init_method", "xavier_normal")
        self.weight_init_method = config.get("weight_init_method", "xavier_normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.pretrain_file = config.get("pretrain_file", "")
        # NGCF's 'norm' includes self loops before normalization; map through
        # the shared builder (same math as NGCF.py:298-317)
        self.adj = build_norm_adjacency(dataset.train_matrix, self.adj_type)
        self.graph_shard = str(config.get("graph_shard", "auto")).lower()
        self._adj_sharded = None
        self._mesh = None

    def on_mesh(self, mesh):
        from neurec_tpu.ops.graph import maybe_shard

        self._adj_sharded = maybe_shard(self.adj, mesh, self.graph_shard)
        self._mesh = mesh

    def init_params(self, rng):
        e_init = get_initializer(self.embed_init_method, self.stddev)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        rng, ku, ki = jax.random.split(rng, 3)
        params = {
            "user_emb": e_init(ku, (self.num_users, self.emb_dim)),
            "item_emb": e_init(ki, (self.num_items, self.emb_dim)),
            "W_gc": [], "b_gc": [], "W_bi": [], "b_bi": [],
            "W_mlp": [], "b_mlp": [],
        }
        dims = [self.emb_dim] + self.weight_size
        for k in range(self.n_layers):
            rng, *ks = jax.random.split(rng, 7)
            params["W_gc"].append(w_init(ks[0], (dims[k], dims[k + 1])))
            params["b_gc"].append(w_init(ks[1], (1, dims[k + 1])))
            params["W_bi"].append(w_init(ks[2], (dims[k], dims[k + 1])))
            params["b_bi"].append(w_init(ks[3], (1, dims[k + 1])))
            params["W_mlp"].append(w_init(ks[4], (dims[k], dims[k + 1])))
            params["b_mlp"].append(w_init(ks[5], (1, dims[k + 1])))
        loaded = try_load(self.pretrain_file)
        if loaded is not None:
            params["user_emb"] = jnp.asarray(loaded[0][0])
            params["item_emb"] = jnp.asarray(loaded[0][1])
        return params

    def _adj_for_step(self, rng, training):
        """Per-step adjacency (SparseAdj or ShardedAdj) with edge dropout."""
        adj = self._adj_sharded if self._adj_sharded is not None else self.adj
        if training and self.node_dropout_flag and rng is not None:
            keep = 1.0 - self.node_dropout_ratio
            if isinstance(adj, SparseAdj) and adj.dense is not None:
                # edge dropout on the dense path: zero entries stay zero, so
                # an elementwise Bernoulli mask == per-edge dropout
                mask = jax.random.bernoulli(rng, keep, adj.dense.shape)
                dense = jnp.where(mask, adj.dense / keep, 0.0)
                return adj._replace(dense=dense)
            mask = jax.random.bernoulli(rng, keep, adj.vals.shape)
            vals = jnp.where(mask, adj.vals / keep, 0.0)
            # the Pallas scatter plans bake the edge values at build time;
            # per-step dropped vals would desync them, so dropout steps run
            # the segment-sum path (eval/no-dropout keeps the kernel)
            return adj._replace(vals=vals, plan=None, plan_t=None)
        return adj

    def _mess_dropout(self, x, rng, training):
        if not training or rng is None or self.mess_dropout_ratio <= 0:
            return x
        keep = 1.0 - self.mess_dropout_ratio
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    def propagate(self, params, rng=None, training=False):
        adj = self._adj_for_step(
            None if rng is None else jax.random.fold_in(rng, 0), training
        )
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = [] if self.alg_type == "gcmc" else [ego]
        h = ego
        for k in range(self.n_layers):
            krng = None if rng is None else jax.random.fold_in(rng, k + 1)
            if isinstance(adj, SparseAdj):
                side = spmm(adj, h)
            else:
                from neurec_tpu.ops.graph import spmm_sharded

                side = spmm_sharded(adj, h, self._mesh)
            if self.alg_type == "ngcf":
                sum_emb = jax.nn.leaky_relu(side @ params["W_gc"][k] + params["b_gc"][k])
                bi = jax.nn.leaky_relu(
                    (h * side) @ params["W_bi"][k] + params["b_bi"][k]
                )
                h = sum_emb + bi
                h = self._mess_dropout(h, krng, training)
                outs.append(_l2norm(h))
            elif self.alg_type == "gcn":
                h = jax.nn.leaky_relu(side @ params["W_gc"][k] + params["b_gc"][k])
                h = self._mess_dropout(h, krng, training)
                outs.append(h)
            elif self.alg_type == "gcmc":
                h = jax.nn.leaky_relu(side @ params["W_gc"][k] + params["b_gc"][k])
                mlp = h @ params["W_mlp"][k] + params["b_mlp"][k]
                mlp = self._mess_dropout(mlp, krng, training)
                outs.append(mlp)
            else:
                raise ValueError("alg_type %r" % self.alg_type)
        all_emb = jnp.concatenate(outs, axis=1)
        return all_emb[: self.num_users], all_emb[self.num_users :]

    def loss(self, params, batch, weights):
        u_table, i_table = self.propagate(params, batch.get("rng"), training=True)
        u = u_table[batch["users"]]
        pi = i_table[batch["pos_items"]]
        ni = i_table[batch["neg_items"]]
        y = jnp.sum(u * pi, axis=-1) - jnp.sum(u * ni, axis=-1)
        mf_loss = jnp.sum(jax.nn.softplus(-y) * weights)
        w = weights[:, None]
        emb_loss = self.reg * l2_loss(u * w, pi * w, ni * w)
        return mf_loss + emb_loss

    def predict(self, params, users):
        u_table, i_table = self.propagate(params, None, training=False)
        return u_table[users] @ i_table.T

    def eval_embeddings(self, params, users):
        u_table, i_table = self.propagate(params, None, training=False)
        return u_table[users], i_table

    def eval_tables(self, params):
        """Hoistable user-independent tables (see LightGCN.eval_tables)."""
        return self.propagate(params, None, training=False)
