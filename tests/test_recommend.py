"""batch_topk serving export: device ranking matches numpy, train items
excluded, original-id round-trip handled by the caller."""

import jax
import numpy as np

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.recommend import batch_topk
from tests.helpers import make_config, make_synthetic_dataset


def test_batch_topk_matches_numpy(tmp_path):
    make_synthetic_dataset(tmp_path, num_users=25, num_items=40)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 8})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(0))

    k = 5
    items, scores = batch_topk(
        model, params, k=k, train_matrix=ds.train_matrix, batch_size=8
    )
    assert items.shape == (ds.num_users, k)

    full = np.asarray(
        model.predict(params, np.arange(ds.num_users, dtype=np.int32))
    ).astype(np.float32)
    for u in range(ds.num_users):
        row = full[u].copy()
        row[ds.train_matrix[u].indices] = -np.inf
        expect = set(np.argsort(-row)[:k].tolist())
        assert set(items[u].tolist()) == expect
        # no train item leaked
        assert not set(items[u].tolist()) & set(ds.train_matrix[u].indices)
        # scores sorted descending
        assert np.all(np.diff(scores[u]) <= 1e-6)


def test_batch_topk_subset_and_no_mask(tmp_path):
    make_synthetic_dataset(tmp_path, num_users=25, num_items=40)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 8})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(1))

    some = np.array([3, 11, 7], dtype=np.int32)
    items, scores = batch_topk(model, params, k=4, users=some, batch_size=2)
    assert items.shape == (3, 4)
    full = np.asarray(model.predict(params, some)).astype(np.float32)
    for r, u in enumerate(some):
        expect = set(np.argsort(-full[r])[:4].tolist())
        assert set(items[r].tolist()) == expect


def test_batch_topk_masks_per_batch_not_per_catalog(tmp_path):
    """ADVICE r4 medium + single-dispatch rework: serving must never
    materialize a (num_users, *) mask structure — consumed items ride as
    per-batch edge pairs sized by the max interactions in ONE batch, for
    requested users only, so memory is bounded at any user count."""
    from neurec_tpu.recommend import _batch_edges_from_csr

    make_synthetic_dataset(tmp_path, num_users=25, num_items=40)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 8})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(2))

    some = np.array([3, 11, 7], dtype=np.int32)
    items, _ = batch_topk(model, params, k=4, users=some,
                          train_matrix=ds.train_matrix, batch_size=2)
    assert items.shape == (3, 4)
    full = np.asarray(model.predict(params, some)).astype(np.float32)
    for r, u in enumerate(some):
        row = full[r].copy()
        row[ds.train_matrix[u].indices] = -np.inf
        assert set(items[r].tolist()) == set(np.argsort(-row)[:4].tolist())

    # edge arrays: only the REQUESTED users' interactions, padded to the
    # max per batch (not num_users x max_row)
    csr = ds.train_matrix.tocsr()
    users_pad = np.array([3, 11, 7, 0], np.int32)
    ei, eu = _batch_edges_from_csr(csr, users_pad, 3, 2, 2)
    nnz_req = sum(
        csr.indptr[u + 1] - csr.indptr[u] for u in (3, 11, 7)
    )
    assert ei.shape[0] == 2
    assert ei.size <= 2 * (nnz_req + 8)
    # pad slots use local id B (dropped by the scatter)
    assert eu.max() <= 2


def test_export_cache_evicts_dead_models(tmp_path):
    """The jitted-export cache must not keep dead models alive (review
    r5: a WeakKeyDictionary was inert because the cached closure
    strongly referenced its key; now id-keyed with a finalizer + LRU)."""
    import gc
    import weakref

    from neurec_tpu import recommend

    make_synthetic_dataset(tmp_path, num_users=25, num_items=40)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 8})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(3))
    batch_topk(model, params, k=4, users=np.array([1, 2], np.int32),
               train_matrix=ds.train_matrix, batch_size=2)
    mid = id(model)
    assert any(k[0] == mid for k in recommend._EXPORT_CACHE)
    ref = weakref.ref(model)
    del model
    gc.collect()
    assert ref() is None, "export cache kept the model alive"
    assert not any(k[0] == mid for k in recommend._EXPORT_CACHE), (
        "dead model's export entries were not evicted"
    )


def test_batch_topk_k_exceeds_catalog(tmp_path):
    """k > num_items must clamp to the full ranked catalog (the
    evaluator's K = min(max_top, num_items) rule) instead of failing at
    lax.top_k trace time (review r5)."""
    make_synthetic_dataset(tmp_path, num_users=12, num_items=15,
                           min_items=3, max_items=6)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 4})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(3))

    items, scores = batch_topk(model, params, k=64, batch_size=8)
    assert items.shape == (ds.num_users, ds.num_items)
    full = np.asarray(
        model.predict(params, np.arange(ds.num_users, dtype=np.int32))
    ).astype(np.float32)
    for u in range(ds.num_users):
        assert set(items[u].tolist()) == set(range(ds.num_items))
        np.testing.assert_allclose(
            scores[u], np.sort(full[u])[::-1], rtol=1e-6)


def test_batch_topk_subset_skips_dense_hoist(tmp_path):
    """A subset query must not pay the all-users dense matrix; only the
    full-catalog export hoists (self-review r5)."""
    make_synthetic_dataset(tmp_path, num_users=16, num_items=20,
                           min_items=3, max_items=6)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 4})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(0))

    calls = {"dense": 0}

    def fake_dense(p):
        calls["dense"] += 1
        return model.predict(
            p, np.arange(model.num_users, dtype=np.int32))

    model.eval_dense_scores = fake_dense
    sub_items, _ = batch_topk(model, params, k=4,
                              users=np.array([1, 2], np.int32))
    assert calls["dense"] == 0
    full_items, _ = batch_topk(model, params, k=4)
    assert calls["dense"] >= 1
    # both paths rank identically
    np.testing.assert_array_equal(full_items[1:3], sub_items)
