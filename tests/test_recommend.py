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


def test_batch_topk_packs_per_batch_not_per_catalog(tmp_path, monkeypatch):
    """ADVICE r4 medium: serving must never materialize a (num_users, I/8)
    bitmap — bits are packed per dispatched batch, for requested users
    only, so device memory is bounded by batch_size at any user count."""
    from neurec_tpu.eval import tiers

    make_synthetic_dataset(tmp_path, num_users=25, num_items=40)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 8})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(2))

    packed_rows = []
    orig = tiers.make_stream_pack

    def spy_make(num_items, block, width):
        fn = orig(num_items, block, width)

        def pack(rows):
            packed_rows.append(int(rows.shape[0]))
            return fn(rows)

        return pack

    monkeypatch.setattr(tiers, "make_stream_pack", spy_make)
    some = np.array([3, 11, 7], dtype=np.int32)
    items, _ = batch_topk(model, params, k=4, users=some,
                          train_matrix=ds.train_matrix, batch_size=2)
    assert items.shape == (3, 4)
    # pack traced with the BATCH leading dim, never num_users
    assert packed_rows and all(b == 2 for b in packed_rows), packed_rows
    full = np.asarray(model.predict(params, some)).astype(np.float32)
    for r, u in enumerate(some):
        row = full[r].copy()
        row[ds.train_matrix[u].indices] = -np.inf
        assert set(items[r].tolist()) == set(np.argsort(-row)[:4].tolist())
