"""SpectralCF — spectral graph convolution CF (Zheng et al., RecSys 2018).

Parity with model/general_recommender/SpectralCF.py:

* graph: dense bipartite A with self connections; L = I - D^-1 A;
  eigendecomposition A_hat = U U^T + U Λ U^T, real part (the reference's
  ``astype(np.float32)`` on the possibly-complex product does exactly this,
  SpectralCF.py:65-67 + :103-125);
* K layers: E <- act(A_hat @ E @ F_k), all layers concatenated
  (SpectralCF.py:69-79);
* BPR on propagated embeddings + reg * l2(propagated lookups).

Scalability note: the (U+I)x(U+I) dense eigendecomposition is inherited
from the reference design; A_hat lives in HBM as a dense matrix, so this
model is only practical for small catalogs (the reference has the same
cliff — it np.linalg.eig's the dense matrix on the host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.general.multivae import _activation
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss


@register("SpectralCF")
class SpectralCF(Recommender):
    data_kind = "pairwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 100))
        self.num_layers = int(config.get("num_layers", 2))
        self.activation = _activation(config.get("activation", "sigmoid"))
        self.loss_function = config.get("loss_function", "BPR")
        self.reg = float(config.get("reg", 0.001))
        self.embed_init_method = config.get("embed_init_method", "xavier_normal")
        self.weight_init_method = config.get("weight_init_method", "xavier_normal")
        self.stddev = float(config.get("stddev", 0.01))

        n = self.num_users + self.num_items
        if n > 20000:
            raise ValueError(
                "SpectralCF requires a dense (U+I)^2 eigendecomposition; "
                "%d nodes is impractical (reference has the same limit)" % n
            )
        graph = np.asarray(dataset.train_matrix.todense(), dtype=np.float32)
        A = np.zeros((n, n), dtype=np.float32)
        A[: self.num_users, self.num_users :] = graph
        A[self.num_users :, : self.num_users] = graph.T
        A += np.identity(n, dtype=np.float32)  # self connections
        D = A.sum(axis=1)
        L = np.identity(n, dtype=np.float32) - np.diag(np.power(D, -1.0)) @ A
        lam, U = np.linalg.eig(L)
        A_hat = U @ U.T + U @ np.diag(lam) @ U.T
        self._A_hat = jnp.asarray(np.real(A_hat).astype(np.float32))

    def init_params(self, rng):
        e_init = get_initializer(self.embed_init_method, self.stddev)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        rng, ku, ki = jax.random.split(rng, 3)
        params = {
            "user_emb": e_init(ku, (self.num_users, self.embedding_size)),
            "item_emb": e_init(ki, (self.num_items, self.embedding_size)),
            "filters": [],
        }
        for _ in range(self.num_layers):
            rng, k = jax.random.split(rng)
            params["filters"].append(
                w_init(k, (self.embedding_size, self.embedding_size))
            )
        return params

    def propagate(self, params):
        emb = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = [emb]
        h = emb
        for k in range(self.num_layers):
            h = self._A_hat @ h
            h = self.activation(h @ params["filters"][k])
            outs.append(h)
        all_emb = jnp.concatenate(outs, axis=1)
        return all_emb[: self.num_users], all_emb[self.num_users :]

    def loss(self, params, batch, weights):
        u_table, i_table = self.propagate(params)
        u = u_table[batch["users"]]
        pi = i_table[batch["pos_items"]]
        ni = i_table[batch["neg_items"]]
        y = jnp.sum(u * pi, axis=-1) - jnp.sum(u * ni, axis=-1)
        w = weights[:, None]
        return pairwise_loss(self.loss_function, y, weights=weights) + (
            self.reg * l2_loss(u * w, pi * w, ni * w)
        )

    def predict(self, params, users):
        u_table, i_table = self.propagate(params)
        return u_table[users] @ i_table.T

    def eval_embeddings(self, params, users):
        u_table, i_table = self.propagate(params)
        return u_table[users], i_table

    def eval_tables(self, params):
        """Hoistable user-independent tables (see LightGCN.eval_tables)."""
        return self.propagate(params)
