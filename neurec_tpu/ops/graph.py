"""Graph ops: normalized bipartite adjacency + on-device SpMM.

Replaces the reference's host scipy adjacency pipeline + TF
``sparse_tensor_dense_matmul`` (LightGCN.py:34-78,132-149, NGCF's 100-fold
sparse split NGCF.py:320-332) with a device-resident COO edge list and a
``segment_sum`` SpMM that lives inside the jitted train step.

Adjacency layout: nodes 0..U-1 are users, U..U+I-1 are items; the matrix is
symmetric (A = [[0, R], [R^T, 0]]). Normalizations mirror LightGCN.py:

* plain: A
* norm:  D^-1 (A + I)
* gcmc:  D^-1 A
* pre:   D^-1/2 A D^-1/2
* (anything else): D^-1 A + I   — the reference's fallback "mean" adjacency
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


class SparseAdj(NamedTuple):
    """Adjacency on device.

    Always carries COO edges (rows/cols/vals, padded to a lane-friendly
    length with zero vals). For small graphs a dense (n_nodes, n_nodes)
    copy is also kept: one MXU matmul beats a sort/scatter segment-sum by
    an order of magnitude, and below ``DENSE_LIMIT`` entries the memory is
    trivial. ``dense`` is None above the limit.
    """

    rows: jnp.ndarray  # (nnz_pad,) int32
    cols: jnp.ndarray  # (nnz_pad,) int32
    vals: jnp.ndarray  # (nnz_pad,) float32
    n_nodes: int
    dense: Optional[jnp.ndarray] = None  # (n_nodes, n_nodes) f32 or None


# dense adjacency cutoff: 64M f32 entries == 256 MB HBM
DENSE_LIMIT = 64 * 1024 * 1024


def _normalize(adj_mat: sp.spmatrix, adj_type: str) -> sp.coo_matrix:
    def normalized_adj_single(adj):
        rowsum = np.array(adj.sum(1))
        d_inv = np.power(rowsum, -1.0, where=rowsum > 0).flatten()
        d_inv[~np.isfinite(d_inv)] = 0.0
        return sp.diags(d_inv).dot(adj).tocoo()

    if adj_type == "plain":
        return adj_mat.tocoo()
    elif adj_type == "norm":
        return normalized_adj_single(adj_mat + sp.eye(adj_mat.shape[0]))
    elif adj_type == "gcmc":
        return normalized_adj_single(adj_mat)
    elif adj_type == "pre":
        rowsum = np.array(adj_mat.sum(1))
        d_inv = np.power(rowsum, -0.5, where=rowsum > 0).flatten()
        d_inv[~np.isfinite(d_inv)] = 0.0
        d_mat_inv = sp.diags(d_inv)
        return d_mat_inv.dot(adj_mat).dot(d_mat_inv).tocoo()
    else:  # reference fallback: mean adjacency + self loops
        mean_adj = normalized_adj_single(adj_mat)
        return (mean_adj + sp.eye(mean_adj.shape[0])).tocoo()


def build_norm_adjacency(
    train_matrix: sp.csr_matrix,
    adj_type: str = "pre",
    pad_multiple: int = 1024,
    self_loops: bool = False,
) -> SparseAdj:
    """Bipartite (U+I)x(U+I) adjacency from the train matrix, normalized.

    ``self_loops`` adds I before normalization (NGCF's A + I variants pass
    their own adj_type instead).
    """
    num_users, num_items = train_matrix.shape
    coo = train_matrix.tocoo()
    n_nodes = num_users + num_items
    ratings = np.ones(coo.nnz, dtype=np.float32)
    tmp = sp.csr_matrix(
        (ratings, (coo.row, coo.col + num_users)), shape=(n_nodes, n_nodes)
    )
    adj_mat = tmp + tmp.T
    if self_loops:
        adj_mat = adj_mat + sp.eye(n_nodes)
    norm = _normalize(adj_mat, adj_type)

    nnz = norm.nnz
    nnz_pad = ((nnz + pad_multiple - 1) // pad_multiple) * pad_multiple
    rows = np.zeros(nnz_pad, dtype=np.int32)
    cols = np.zeros(nnz_pad, dtype=np.int32)
    vals = np.zeros(nnz_pad, dtype=np.float32)
    # sort by row so segment_sum can use indices_are_sorted
    order = np.argsort(norm.row, kind="stable")
    rows[:nnz] = norm.row[order]
    cols[:nnz] = norm.col[order]
    vals[:nnz] = norm.data[order]
    dense = None
    if n_nodes * n_nodes <= DENSE_LIMIT:
        dense = jnp.asarray(norm.toarray().astype(np.float32))
    # padding edges point at node 0 with value 0 — no-ops under segment_sum
    return SparseAdj(
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        n_nodes=n_nodes,
        dense=dense,
    )


def spmm(adj: SparseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """(n_nodes x n_nodes) adjacency @ dense (n_nodes, d).

    Dense MXU matmul when the adjacency fits under DENSE_LIMIT; otherwise
    a sorted COO segment-sum.
    """
    if adj.dense is not None:
        return jnp.dot(adj.dense, x, preferred_element_type=jnp.float32)
    gathered = x[adj.cols] * adj.vals[:, None]
    return jax.ops.segment_sum(
        gathered, adj.rows, num_segments=adj.n_nodes, indices_are_sorted=True
    )
