"""DiffNet — influence-diffusion social recommender (Wu et al., SIGIR 2019).

Parity with model/social_recommender/DiffNet.py:20-225 (as coded — the
commented-out fusion layers reduce to additions):

* item_final = item_embedding + convertDist(sigmoid_dense(convertDist(item
  features))) when feature files exist, else item_embedding;
* user_final = S(S(user_embedding)) + C(item_final) where S is the
  row-normalized symmetric social matrix and C the row-normalized
  consumed-items matrix — both device COO segment-sum SpMMs;
* pointwise sigmoid CE (mean) over PointwiseSampler feeds with
  reg_mf * l2(batch lookups);
* eval = user_final @ item_final^T (the reference's evaluate() feeds
  nothing into its lookup placeholders — intended table scoring used).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.data.social import load_social_matrix
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pointwise_loss
from neurec_tpu.ops.towers import init_dense_stack


def _row_normalized_coo(matrix):
    """CSR -> (rows, cols, vals) with 1/row_nnz values, row-sorted."""
    coo = matrix.tocoo()
    row_nnz = np.asarray((matrix != 0).sum(axis=1)).ravel()
    vals = 1.0 / np.maximum(row_nnz[coo.row], 1)
    order = np.argsort(coo.row, kind="stable")
    return (
        jnp.asarray(coo.row[order].astype(np.int32)),
        jnp.asarray(coo.col[order].astype(np.int32)),
        jnp.asarray(vals[order].astype(np.float32)),
    )


def _convert_distribution(x, eps=1e-12):
    mean = jnp.mean(x)
    var = jnp.maximum(jnp.var(x), eps)
    return (x - mean) * 0.1 * jax.lax.rsqrt(var)


def _load_features(path, id_map, num_rows, dim):
    vectors = np.zeros((num_rows, dim), dtype=np.float32)
    found = False
    if path and os.path.isfile(path):
        with open(path, "r") as f:
            for line in f:
                idx, data = line.strip().split("::::")
                for key in (idx, int(idx) if idx.isdigit() else idx):
                    if key in id_map:
                        vectors[id_map[key]] = eval(data)  # noqa: S307 parity
                        found = True
                        break
    return vectors, found


@register("DiffNet")
class DiffNet(Recommender):
    data_kind = "pointwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.reg_mf = float(config.get("reg_mf", 1e-5))
        self.feature_dimension = int(config.get("feature_dimension", 150))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.loss_function = "cross_entropy"

        social = load_social_matrix(dataset, config)
        social = social + social.T
        self._soc_edges = _row_normalized_coo(social)
        self._cons_edges = _row_normalized_coo(dataset.train_matrix)

        self._user_feat, self._has_user_feat = _load_features(
            config.get("user_feature_file"), dataset.userids,
            self.num_users, self.feature_dimension,
        )
        self._item_feat, self._has_item_feat = _load_features(
            config.get("item_feature_file"), dataset.itemids,
            self.num_items, self.feature_dimension,
        )
        self._user_feat = jnp.asarray(self._user_feat)
        self._item_feat = jnp.asarray(self._item_feat)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "user_emb": init(k1, (self.num_users, self.embedding_size)),
            "item_emb": init(k2, (self.num_items, self.embedding_size)),
            "reduce_dim": init_dense_stack(
                k3, self.feature_dimension, [self.embedding_size]
            ),
        }

    def _spmm(self, edges, x, n_out):
        rows, cols, vals = edges
        return jax.ops.segment_sum(
            x[cols] * vals[:, None], rows, num_segments=n_out,
            indices_are_sorted=True,
        )

    def _tables(self, params):
        item_final = params["item_emb"]
        if self._has_item_feat:
            feat = _convert_distribution(self._item_feat)
            layer = params["reduce_dim"][0]
            reduced = jax.nn.sigmoid(feat @ layer["w"] + layer["b"])
            item_final = item_final + _convert_distribution(reduced)
        from_items = self._spmm(self._cons_edges, item_final, self.num_users)
        gcn1 = self._spmm(self._soc_edges, params["user_emb"], self.num_users)
        gcn2 = self._spmm(self._soc_edges, gcn1, self.num_users)
        return gcn2 + from_items, item_final

    def loss(self, params, batch, weights):
        u_table, i_table = self._tables(params)
        u = u_table[batch["users"]]
        q = i_table[batch["items"]]
        y = jnp.sum(u * q, axis=-1)
        w = weights[:, None]
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mf * l2_loss(u * w, q * w)

    def predict(self, params, users):
        u_table, i_table = self._tables(params)
        return u_table[users] @ i_table.T

    def eval_embeddings(self, params, users):
        u_table, i_table = self._tables(params)
        return u_table[users], i_table

    def eval_tables(self, params):
        """Hoistable user-independent tables (see LightGCN.eval_tables)."""
        return self._tables(params)
