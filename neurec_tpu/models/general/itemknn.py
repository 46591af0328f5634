"""ItemKNN — item-item neighborhood recommender.

Parity with model/general_recommender/ItemKNN.py (Compute_Similarity
dispatcher :216, Python variant :240, Euclidean variant :11, recommender
:549): column-wise item similarities with top-K sparsification and
shrinkage, ratings = R @ W.

Similarities (computed on the columns of R):
* cosine:     dot / (|i||j| + shrink + 1e-6)
* asymmetric: dot / (|i|^{2a} |j|^{2(1-a)} + shrink + 1e-6)
* adjusted:   cosine after removing each USER's mean rating
* pearson:    cosine after removing each ITEM's mean rating
* jaccard:    dot / (ss_i + ss_j - dot + shrink + 1e-6)
* dice:       dot / (ss_i + ss_j + shrink + 1e-6)
* tversky:    dot / (dot + a(ss_i - dot) + b(ss_j - dot) + shrink + 1e-6)
* euclidean:  1 / (sqrt(ss_i + ss_j - 2 dot) + shrink + 1e-9), self-distance
              zeroed (so the self-similarity spike survives top-K, exactly
              like the reference — harmless because eval masks train items)
Self-similarity is zeroed for all non-euclidean modes before top-K
(reference: this_column_weights[columnIndex] = 0).

TPU-first: the reference loops 100-column blocks in numpy on the host
(printing columns/sec); here the whole similarity + per-column top-K +
neighbor-weighted scoring runs as blocked device matmuls + lax.top_k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.models.base import Recommender, register


@register("ItemKNN")
class ItemKNN(Recommender):
    data_kind = "none"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.topK = int(config.get("neighbor", 5))
        self.shrink = float(config.get("shrink", 0))
        self.similarity = config.get("similarity", "cosine")
        self.asymmetric_alpha = float(config.get("asymmetric_alpha", 0.5))
        self.tversky_alpha = float(config.get("tversky_alpha", 1.0))
        self.tversky_beta = float(config.get("tversky_beta", 1.0))
        self.epochs = 0
        self._R = np.asarray(dataset.train_matrix.todense(), dtype=np.float32)

    def init_params(self, rng):
        ratings = self._compute_ratings(jnp.asarray(self._R))
        return {"ratings": ratings}

    def _compute_ratings(self, R: jnp.ndarray, block: int = 512) -> jnp.ndarray:
        num_items = R.shape[1]
        K = min(self.topK, num_items)
        sim_mode = self.similarity

        if sim_mode == "adjusted":
            counts = jnp.maximum(jnp.sum(R != 0, axis=1, keepdims=True), 1)
            mean = jnp.sum(R, axis=1, keepdims=True) / counts
            R = jnp.where(R != 0, R - mean, 0.0)
        elif sim_mode == "pearson":
            counts = jnp.maximum(jnp.sum(R != 0, axis=0, keepdims=True), 1)
            mean = jnp.sum(R, axis=0, keepdims=True) / counts
            R = jnp.where(R != 0, R - mean, 0.0)

        ss = jnp.sum(jnp.square(R), axis=0)                  # (I,)
        norms = jnp.sqrt(ss)
        n_blocks = -(-num_items // block)
        padded = n_blocks * block
        col_ids = jnp.arange(padded).reshape(n_blocks, block)

        def score_block(carry, cols):
            cols_c = jnp.minimum(cols, num_items - 1)
            dot = R.T[cols_c] @ R                            # (Bc, I)
            ss_c = ss[cols_c][:, None]
            if sim_mode in ("cosine", "adjusted", "pearson"):
                denom = norms[cols_c][:, None] * norms[None, :] + self.shrink + 1e-6
                sim = dot / denom
            elif sim_mode == "asymmetric":
                a = self.asymmetric_alpha
                denom = (
                    jnp.power(ss[cols_c][:, None], a)
                    * jnp.power(ss[None, :], 1.0 - a)
                    + self.shrink + 1e-6
                )
                sim = dot / denom
            elif sim_mode in ("jaccard", "tanimoto"):
                sim = dot / (ss_c + ss[None, :] - dot + self.shrink + 1e-6)
            elif sim_mode == "dice":
                sim = dot / (ss_c + ss[None, :] + self.shrink + 1e-6)
            elif sim_mode == "tversky":
                sim = dot / (
                    dot
                    + self.tversky_alpha * (ss_c - dot)
                    + self.tversky_beta * (ss[None, :] - dot)
                    + self.shrink + 1e-6
                )
            elif sim_mode == "euclidean":
                dist_sq = jnp.maximum(ss_c + ss[None, :] - 2.0 * dot, 0.0)
                self_mask = cols_c[:, None] == jnp.arange(num_items)[None, :]
                dist = jnp.sqrt(jnp.where(self_mask, 0.0, dist_sq))
                sim = 1.0 / (dist + self.shrink + 1e-9)
            else:
                raise ValueError("unknown similarity '%s'" % sim_mode)

            if sim_mode != "euclidean":
                self_mask = cols_c[:, None] == jnp.arange(num_items)[None, :]
                sim = jnp.where(self_mask, 0.0, sim)

            vals, idx = jax.lax.top_k(sim, K)                # (Bc, K)
            # ratings[:, col] = sum_k R[:, idx_k] * val_k
            gathered = R.T[idx]                              # (Bc, K, U)
            block_ratings = jnp.einsum("cku,ck->uc", gathered, vals)
            return carry, block_ratings

        _, blocks = jax.lax.scan(score_block, 0, col_ids)  # (nb, U, Bc)
        ratings = jnp.moveaxis(blocks, 0, 1).reshape(R.shape[0], padded)
        return ratings[:, :num_items]

    def loss(self, params, batch, weights):
        raise RuntimeError("ItemKNN has no training loss")

    def predict(self, params, users):
        return params["ratings"][users]
