"""Dataset pipeline: filter/split/remap semantics + cache behavior."""

import os

import numpy as np
import pandas as pd
import pytest

from neurec_tpu.config import Config
from neurec_tpu.data.dataset import Dataset, csr_to_user_dict, csr_to_user_dict_bytime
from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.data.preprocess import filter_data, split_by_loo, split_by_ratio
from neurec_tpu.data.sequences import pad_sequences


def _make_ratings(tmp_path, rows, name="toy", sep="\t"):
    path = tmp_path / ("%s.rating" % name)
    with open(path, "w") as f:
        for r in rows:
            f.write(sep.join(str(x) for x in r) + "\n")
    return path


def _toy_config(tmp_path, **overrides):
    lib = tmp_path / "NeuRec.properties"
    base = {
        "recommender": "MF",
        "config_dir": str(tmp_path),
        "data.input.path": str(tmp_path),
        "data.input.dataset": "toy",
        "data.column.format": "UIRT",
        "data.convert.separator": "'\\t'",
        "user_min": "0",
        "item_min": "0",
        "splitter": "ratio",
        "ratio": "0.8",
        "by_time": "True",
        "rec.evaluate.neg": "0",
    }
    base.update({k: str(v) for k, v in overrides.items()})
    lib.write_text(
        "[default]\n" + "\n".join("%s=%s" % kv for kv in base.items()) + "\n"
    )
    (tmp_path / "MF.properties").write_text("[hyperparameters]\nlr=0.1\n")
    return Config(str(lib), cmd_args=[])


def test_filter_data_order():
    df = pd.DataFrame(
        {
            "user": [1, 1, 1, 2, 2, 3],
            "item": [10, 11, 12, 10, 11, 12],
            "rating": [1.0] * 6,
        }
    )
    # item 12 appears twice, others twice; with item_min=2 everything stays
    out = filter_data(df.copy(), user_min=2, item_min=2)
    assert 3 not in out["user"].values  # user 3 has 1 interaction
    assert len(out) == 5


def test_split_by_ratio_by_time():
    df = pd.DataFrame(
        {
            "user": [0] * 5 + [1] * 4,
            "item": [0, 1, 2, 3, 4, 0, 1, 2, 3],
            "rating": [1.0] * 9,
            "time": [5, 4, 3, 2, 1, 1, 2, 3, 4],
        }
    )
    train, test = split_by_ratio(df, ratio=0.8, by_time=True)
    # user 0: 5 items, ceil(4.0)=4 in train; latest-time item (time=5 -> item 0) in test
    u0_test = test[test["user"] == 0]
    assert len(u0_test) == 1 and u0_test["item"].iloc[0] == 0
    # user 1: 4 items, ceil(3.2)=4 -> all in train
    assert len(test[test["user"] == 1]) == 0


def test_split_by_loo():
    df = pd.DataFrame(
        {
            "user": [0] * 5 + [1] * 3,
            "item": [0, 1, 2, 3, 4, 7, 8, 9],
            "rating": [1.0] * 8,
            "time": [1, 2, 3, 4, 5, 1, 2, 3],
        }
    )
    train, test = split_by_loo(df, by_time=True)
    # user 0 has 5 > 3: last item (4) goes to test
    assert test[test["user"] == 0]["item"].tolist() == [4]
    # user 1 has 3 <= 3: kept whole in train
    assert len(test[test["user"] == 1]) == 0
    assert sorted(train[train["user"] == 1]["item"].tolist()) == [7, 8, 9]


def test_dataset_end_to_end_and_cache(tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    for u in range(20):
        items = rng.choice(50, size=rng.randint(5, 15), replace=False)
        for t, i in enumerate(items):
            rows.append((u + 100, i + 1000, 1.0, t))
    _make_ratings(tmp_path, rows)
    conf = _toy_config(tmp_path)
    ds = Dataset(conf)
    assert ds.num_users == 20
    assert ds.train_matrix.shape == (ds.num_users, ds.num_items)
    assert ds.train_matrix.nnz + ds.test_matrix.nnz == len(rows)
    # every user's train/test items are disjoint
    tr = csr_to_user_dict(ds.train_matrix)
    te = csr_to_user_dict(ds.test_matrix)
    for u, items in te.items():
        assert not set(items) & set(tr[u])

    # cache round-trip produces identical matrices
    cache_dir = os.path.join(str(tmp_path), "_tmp_toy")
    assert os.path.isdir(cache_dir)
    ds2 = Dataset(_toy_config(tmp_path))
    assert (ds2.train_matrix != ds.train_matrix).nnz == 0
    assert (ds2.test_matrix != ds.test_matrix).nnz == 0

    # md5 invalidation: touch source -> re-split
    with open(tmp_path / "toy.rating", "a") as f:
        f.write("999\t1000\t1.0\t0\n")
    ds3 = Dataset(_toy_config(tmp_path))
    assert ds3.num_users == 21


def test_bytime_user_dict(tmp_path):
    rows = [
        (0, 10, 1.0, 5),
        (0, 11, 1.0, 1),
        (0, 12, 1.0, 3),
        (1, 10, 1.0, 2),
        (1, 12, 1.0, 1),
    ]
    _make_ratings(tmp_path, rows)
    conf = _toy_config(tmp_path, ratio="1.0")
    ds = Dataset(conf)
    d = csr_to_user_dict_bytime(ds.time_matrix, ds.train_matrix)
    # user 0 by time: item 11 (t=1), 12 (t=3), 10 (t=5) in remapped ids
    i11, i12, i10 = ds.itemids[11], ds.itemids[12], ds.itemids[10]
    assert d[ds.userids[0]] == [i11, i12, i10]
    assert d[ds.userids[1]] == [i12, i10]


def test_padded_positives():
    from scipy.sparse import csr_matrix

    m = csr_matrix(
        (np.ones(4), ([0, 0, 2, 2], [3, 1, 0, 4])), shape=(3, 5)
    )
    p = build_padded_positives(m, pad_multiple=4, min_len=4)
    assert p.items.shape == (3, 4)
    assert p.items[0, :2].tolist() == [1, 3]  # sorted
    assert (p.items[1] == 5).all()  # empty row fully padded
    assert p.lengths.tolist() == [2, 0, 2]


def test_pad_sequences():
    seqs = [[1, 2, 3], [4], []]
    post = pad_sequences(seqs, value=0, max_len=4, padding="post")
    np.testing.assert_array_equal(post[0], [1, 2, 3, 0])
    pre = pad_sequences(seqs, value=9, max_len=2, padding="pre", truncating="pre")
    np.testing.assert_array_equal(pre[0], [2, 3])
    np.testing.assert_array_equal(pre[1], [9, 4])
    np.testing.assert_array_equal(pre[2], [9, 9])


def test_given_splitter(tmp_path):
    """splitter=given loads pre-split .train/.test files (dataset.py:76-83
    of the reference; gowalla ships this way) and remaps ids jointly."""
    rng = np.random.RandomState(1)
    train_rows, test_rows = [], []
    for u in range(15):
        items = rng.choice(40, size=10, replace=False)
        for i in items[:8]:
            train_rows.append((u + 7, i + 100))
        for i in items[8:]:
            test_rows.append((u + 7, i + 100))
    for name, rows in (("toy.train", train_rows), ("toy.test", test_rows)):
        with open(tmp_path / name, "w") as f:
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")
    conf = _toy_config(
        tmp_path,
        **{
            "splitter": "given",
            "data.column.format": "UI",
            "data.convert.separator": "','",
            "by_time": "False",
        },
    )
    ds = Dataset(conf)
    assert ds.num_users == 15
    assert ds.train_matrix.nnz == len(train_rows)
    assert ds.test_matrix.nnz == len(test_rows)
    # joint remap: a test item also in train shares one id space
    raw_pairs = {(u, i) for u, i in train_rows}
    tr = csr_to_user_dict(ds.train_matrix)
    inv_u = {v: k for k, v in ds.userids.items()}
    inv_i = {v: k for k, v in ds.itemids.items()}
    got = {(inv_u[u], inv_i[i]) for u, items in tr.items() for i in items}
    assert got == raw_pairs

    # cache round-trip
    ds2 = Dataset(conf)
    assert (ds2.train_matrix != ds.train_matrix).nnz == 0
    assert (ds2.test_matrix != ds.test_matrix).nnz == 0


def test_overfiltered_dataset_raises_clear_error(tmp_path):
    """user_min/item_min that drop every interaction must fail with an
    actionable message, not a NaN-to-int crash from the id remap."""
    import pytest

    from neurec_tpu.data.dataset import Dataset
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=10, num_items=20,
                           min_items=2, max_items=4)
    conf = make_config(tmp_path, user_min="1000", item_min="1000")
    with pytest.raises(ValueError, match="filtered out all"):
        Dataset(conf)


def test_shipped_neg_file_remaps_numeric_ids(tmp_path):
    """A dataset-shipped .neg file with numeric ids must remap through
    user2id/item2id: the maps are keyed by the pandas-parsed (int) id
    tokens, so a str(line).split() lookup raised KeyError on every
    numeric-id dataset (review r5). The remapped .neg<N> cache must feed
    negative_matrix with exactly the shipped candidates."""
    import numpy as np

    from neurec_tpu.data.dataset import Dataset
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=10, num_items=20,
                           min_items=4, max_items=6)
    # 3 negatives per user, chosen outside each user's interactions
    import pandas as pd

    all_rows = pd.read_csv(tmp_path / "synth.rating", sep="\t", header=None,
                           names=["user", "item", "rating", "time"])
    lines = []
    shipped = {}
    for u, grp in all_rows.groupby("user"):
        pool = sorted(set(range(20)) - set(grp["item"]))[:3]
        shipped[int(u)] = pool
        lines.append("\t".join(str(x) for x in [u] + pool))
    (tmp_path / "synth.neg").write_text("\n".join(lines) + "\n")

    conf = make_config(tmp_path, **{"rec.evaluate.neg": 3})
    ds = Dataset(conf)  # KeyError here before the fix
    assert ds.negative_matrix is not None
    neg_dict = ds.get_user_test_neg_dict()
    for orig_u, negs in shipped.items():
        new_u = ds.userids[orig_u]
        want = {ds.itemids[i] for i in negs}
        assert set(neg_dict[new_u]) == want


def test_shipped_neg_file_mixed_dtype_columns(tmp_path):
    """pandas infers dtype per column: with string ids in .rating, a .neg
    column whose tokens are all numeric parses as int64 and missed the
    str-keyed maps (self-review r5)."""
    import numpy as np

    from neurec_tpu.data.dataset import Dataset
    from tests.helpers import make_config

    rng = np.random.RandomState(0)
    items = ["a", "b", "3", "4", "c5", "6", "d", "8", "e", "10"]
    lines = []
    for u in range(8):
        chosen = rng.choice(10, size=6, replace=False)
        for t, ci in enumerate(chosen):
            lines.append("u%d\t%s\t1.0\t%d" % (u, items[ci], t))
    (tmp_path / "synth.rating").write_text("\n".join(lines) + "\n")
    # negatives chosen among the all-numeric tokens -> int64 .neg columns
    neg_lines = []
    for u in range(8):
        used = {l.split("\t")[1] for l in lines
                if l.startswith("u%d\t" % u)}
        pool = [i for i in ("3", "4", "6", "8") if i not in used][:2]
        if len(pool) < 2:
            pool = (pool + ["3", "4", "6", "8"])[:2]
        neg_lines.append("u%d\t%s" % (u, "\t".join(pool)))
    (tmp_path / "synth.neg").write_text("\n".join(neg_lines) + "\n")

    conf = make_config(tmp_path, **{"rec.evaluate.neg": 2})
    ds = Dataset(conf)  # KeyError (int64 token vs str key) before the fix
    assert ds.negative_matrix is not None
    assert ds.negative_matrix.nnz >= 8
