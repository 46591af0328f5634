"""Heavy-tailed (zipf) data must not pay the padded-to-max row-table
cliff (VERDICT r4 missing #3 / next #4): training uses the pair-hash
exclusion set above the byte budget, default evaluation packs bits from
host chunks / per-batch edge lists, and the padded (U, L_max) device
table is never built on those paths. CI runs a scaled-down zipf config;
benchmarks/padded_cliff.py commits the full-scale measurement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from neurec_tpu.eval import tiers
from neurec_tpu.eval.evaluator import UniEvaluator


def _zipf_interactions(num_users=3000, num_items=2000, mean_len=8,
                       max_len=600, seed=0):
    """Per-user row lengths ~ zipf-tailed: most users tiny, one power
    user with max_len interactions."""
    rng = np.random.RandomState(seed)
    lens = np.minimum(
        rng.zipf(1.7, num_users) + mean_len - 1, max_len
    ).astype(np.int64)
    lens[0] = max_len  # guarantee the tail
    rows, cols = [], []
    for u in range(num_users):
        k = min(int(lens[u]), num_items - 1)
        items = rng.choice(num_items, size=k, replace=False)
        rows.append(np.full(k, u))
        cols.append(items)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    return rows, cols, num_users, num_items


def _dicts_from(rows, cols, n_test_per_user=1, seed=1):
    rng = np.random.RandomState(seed)
    train, test = {}, {}
    by_u = {}
    for u, i in zip(rows, cols):
        by_u.setdefault(int(u), []).append(int(i))
    for u, items in by_u.items():
        if len(items) < 2:
            train[u] = items
            continue
        k = min(n_test_per_user, len(items) - 1)
        test[u] = items[:k]
        train[u] = items[k:]
    return train, test


def test_trainer_switches_to_bloom_exclusion_over_budget(tmp_path, monkeypatch):
    """Above the exclusion-table budget the sampled epochs must use the
    pair Bloom filter, never build the padded table, and still train MF
    (finite decreasing loss, statistically clean exclusion)."""
    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=60, num_items=80)
    conf = make_config(
        tmp_path, recommender="MF",
        alg_props={
            "epochs": 2, "batch_size": 64, "embedding_size": 8,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.01, "verbose": 2,
        },
    )
    dataset = Dataset(conf)
    monkeypatch.setattr(trainer_mod, "_EXCL_TABLE_BUDGET", 0)
    model = get_model("MF")(dataset, conf)

    class SilentLogger:
        def info(self, msg):
            pass

        debug = warning = error = critical = info

    tr = Trainer(model, dataset, conf, logger=SilentLogger())
    assert tr._excl_bloom is not None, "Bloom exclusion did not engage"
    tr.initialize()
    losses = []
    key = jax.random.PRNGKey(0)
    for e in range(4):
        tr.params, tr.opt_state, loss = tr._epoch_fn(
            tr.params, tr.opt_state, jax.random.fold_in(key, e),
            jnp.int32(e + 1),
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "MF did not learn under Bloom exclusion"
    assert tr._Trainer__padded is None, (
        "padded exclusion table was built despite Bloom exclusion"
    )


def test_bloom_no_false_negatives_and_low_fp():
    from neurec_tpu.ops.bloom import build_pair_bloom, is_positive_bloom

    rows, cols, U, I = _zipf_interactions(num_users=500, num_items=400)
    bf = build_pair_bloom(rows, cols)
    truth = set(zip(rows.tolist(), cols.tolist()))
    rng = np.random.RandomState(3)
    qu = np.concatenate([rows[:3000], rng.randint(0, U, 5000)])
    qi = np.concatenate([cols[:3000], rng.randint(0, I, 5000)])
    got = np.asarray(
        is_positive_bloom(
            jnp.asarray(bf.table), bf.n_bits,
            jnp.asarray(qu.astype(np.int32)),
            jnp.asarray(qi.astype(np.int32))[:, None],
        )
    )[:, 0]
    want = np.array([(int(u), int(i)) in truth for u, i in zip(qu, qi)])
    # exactness direction that matters: NO false negatives ever
    assert not np.any(want & ~got), "Bloom filter dropped a true positive"
    # false-positive rate near the design point (~2% at 8 bits, k=5)
    neg = ~want
    fp_rate = float(np.mean(got[neg]))
    assert fp_rate < 0.05, "FP rate %.3f too high" % fp_rate
    # footprint ~1 byte/pair (vs 4 bytes/pair CSR), pow2-rounded
    assert bf.nbytes() <= 2 * len(rows)


def test_bloom_sampler_never_samples_positives():
    from neurec_tpu.ops.bloom import build_pair_bloom, sample_negatives_bloom

    # realistic sparsity: even the power user covers < 15% of the
    # catalog, so the bounded-rejection fallback probability ~ d^16 ~ 0
    rows, cols, U, I = _zipf_interactions(num_users=200, num_items=2000,
                                          max_len=300)
    bf = build_pair_bloom(rows, cols)
    truth = set(zip(rows.tolist(), cols.tolist()))
    users = jnp.asarray(np.arange(128, dtype=np.int32) % U)
    negs = np.asarray(
        sample_negatives_bloom(
            jax.random.PRNGKey(5), users, jnp.asarray(bf.table), bf.n_bits,
            I, (4,),
        )
    )
    hit = sum(
        (int(u), int(i)) in truth
        for r, u in enumerate(np.asarray(users))
        for i in negs[r]
    )
    # no false negatives in the filter -> positives cannot be sampled
    # except via the bounded-rejection fallback (~d^16 ~ 0 here)
    assert hit == 0, "sampled %d positives as negatives" % hit


def test_zipf_eval_never_builds_padded_table(monkeypatch):
    """Default (bits) and streamed evaluation on zipf data must never
    materialize the (U, L_max) device row table, and streamed results
    must equal the table path exactly."""
    rows, cols, U, I = _zipf_interactions()
    train, test = _dicts_from(rows, cols)
    d = 8
    rng = np.random.RandomState(2)
    params = {
        "u": jnp.asarray(rng.standard_normal((U, d)).astype(np.float32)),
        "q": jnp.asarray(rng.standard_normal((I, d)).astype(np.float32)),
    }

    class TinyMF:
        def predict(self, p, users):
            return p["u"][users] @ p["q"].T

        def eval_embeddings(self, p, users):
            return p["u"][users], p["q"]

    model = TinyMF()
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    kw = dict(metric=["Recall", "NDCG"], top_k=[10], batch_size=256,
              num_items=I)

    ev_tab = UniEvaluator(train, test, **kw)
    want = ev_tab.evaluate(model.predict, params)
    assert ev_tab._get_steps(model.predict).plan.table
    assert ev_tab._UniEvaluator__train_rows is None, (
        "bits-table path built the padded row table"
    )

    monkeypatch.setattr(tiers, "BITS_TABLE_BUDGET", 0)
    ev_str = UniEvaluator(train, test, **kw)
    got = ev_str.evaluate(model.predict, params)
    assert ev_str._get_steps(model.predict).plan.stream
    assert got == want
    assert ev_str._UniEvaluator__train_rows is None, (
        "streamed path built the padded row table"
    )
    # the streamed scan input is edge-sized, not (U, L_max)-sized
    e_items, e_users = ev_str._default_edges_cache
    nnz = sum(len(v) for v in train.values())
    l_max = max(len(v) for v in train.values())
    assert e_items.size + e_users.size <= 6 * nnz, (
        "edge tensors %d ints vs nnz %d" % (e_items.size + e_users.size, nnz)
    )
    assert e_items.size < U * l_max / 4, "edge layout did not beat padding"


def test_zipf_grouped_subset_eval_matches(monkeypatch):
    """Streamed tier with explicit test_users (grouped-eval path) builds
    per-call edges and matches the table path."""
    rows, cols, U, I = _zipf_interactions(num_users=400, num_items=300)
    train, test = _dicts_from(rows, cols)
    rng = np.random.RandomState(4)
    params_u = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    params_q = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    params = {"u": params_u, "q": params_q}

    class TinyMF:
        def predict(self, p, users):
            return p["u"][users] @ p["q"].T

        def eval_embeddings(self, p, users):
            return p["u"][users], p["q"]

    model = TinyMF()
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    subset = list(test.keys())[::3]
    kw = dict(metric=["Recall"], top_k=[10], batch_size=64, num_items=I)
    ev_tab = UniEvaluator(train, test, **kw)
    want = ev_tab.evaluate(model.predict, params, subset)
    monkeypatch.setattr(tiers, "BITS_TABLE_BUDGET", 0)
    ev_str = UniEvaluator(train, test, **kw)
    got = ev_str.evaluate(model.predict, params, subset)
    assert ev_str._get_steps(model.predict).plan.stream
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bloom_exclusion_trains_on_mesh(tmp_path, monkeypatch):
    """Bloom-exclusion sampling must compose with the (4,2) mesh epochs:
    same seed on mesh and single device gives numerically close params
    (the Bloom table is replicated; draws and membership are identical)."""
    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.parallel.mesh import make_mesh
    from neurec_tpu.trainer import Trainer
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=60, num_items=80)
    conf = make_config(
        tmp_path, recommender="MF",
        alg_props={
            "epochs": 2, "batch_size": 64, "embedding_size": 8,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.01, "verbose": 2,
        },
    )
    dataset = Dataset(conf)
    monkeypatch.setattr(trainer_mod, "_EXCL_TABLE_BUDGET", 0)

    class SilentLogger:
        def info(self, msg):
            pass

        debug = warning = error = critical = info

    results = []
    for mesh in (None, make_mesh(n_data=4, n_model=2)):
        model = get_model("MF")(dataset, conf)
        tr = Trainer(model, dataset, conf, mesh=mesh, logger=SilentLogger())
        assert tr._excl_bloom is not None
        tr.initialize()
        key = jax.random.PRNGKey(3)
        for e in range(2):
            tr.params, tr.opt_state, _ = tr._epoch_fn(
                tr.params, tr.opt_state, jax.random.fold_in(key, e),
                jnp.int32(e + 1),
            )
        results.append(np.asarray(tr.params["item_emb"]))
    np.testing.assert_allclose(results[0], results[1], rtol=5e-3, atol=1e-4)


def test_bloom_rounds_scale_with_worst_density(tmp_path, monkeypatch):
    """The pre-draw rejection-round count must rise with the worst
    per-user density (review r5: a flat 6 leaked positives for dense
    power users). Sparse data stays at 6; a user covering ~half the
    catalog drives it to the 16-round ceiling."""
    import neurec_tpu.trainer as trainer_mod
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer

    monkeypatch.setattr(trainer_mod, "_EXCL_TABLE_BUDGET", 0)

    class SilentLogger:
        def info(self, msg):
            pass

        debug = warning = error = critical = info

    class _Conf(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    conf = _Conf(recommender="MF", epochs=1, batch_size=32,
                 embedding_size=4, reg_mf=0.0, learning_rate=0.05,
                 learner="adam", num_negatives=1, is_pairwise="True",
                 loss_function="bpr", init_method="normal", stddev=0.01,
                 verbose=1, topk=10, test_batch_size=32,
                 metric=["Recall"])

    def rounds_for(rows, cols, U, I):
        import scipy.sparse as sps

        class DS:
            train_matrix = sps.csr_matrix(
                (np.ones(len(rows), np.float32), (rows, cols)), shape=(U, I)
            )
            num_users, num_items = U, I

            def get_user_train_dict(self, by_time=False):
                d = {}
                for u, i in zip(rows, cols):
                    d.setdefault(int(u), []).append(int(i))
                return d

            def get_user_test_dict(self):
                return {0: [int(cols[0])]}

            def get_user_test_neg_dict(self):
                return None

        ds = DS()
        model = get_model("MF")(ds, conf)
        tr = Trainer(model, ds, conf, logger=SilentLogger())
        assert tr._excl_bloom is not None
        tr.initialize()  # builds the epoch (computes _bloom_rounds)
        lens = np.diff(ds.train_matrix.indptr)
        return tr._bloom_rounds, float(lens.max()) / ds.num_items

    rng = np.random.RandomState(0)
    # sparse: 100 users x 10 items each of 10k
    rows = np.repeat(np.arange(100), 10)
    cols = rng.randint(0, 10_000, 1000)
    r_sparse, d_s = rounds_for(rows, cols, 100, 10_000)
    assert r_sparse == 6, (r_sparse, d_s)
    # one power user covering 45% of a small catalog
    rows2 = np.concatenate([np.zeros(450, np.int64), np.arange(1, 50)])
    cols2 = np.concatenate([rng.permutation(1000)[:450],
                            rng.randint(0, 1000, 49)])
    r_dense, d_d = rounds_for(rows2, cols2, 50, 1000)
    assert r_dense == 16, (r_dense, d_d)
