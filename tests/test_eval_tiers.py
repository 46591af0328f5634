"""The evaluation tier table (eval/tiers.py): selection matrix, cross-tier
bit-exactness, streamed bits packing, and the composed item-sharded bits
path at big-catalog scale (VERDICT r4 #1, #2, #7, #10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurec_tpu.eval import tiers
from neurec_tpu.eval.evaluator import UniEvaluator
from neurec_tpu.eval.tiers import select_tier


# -- selector ---------------------------------------------------------------

_BASE = dict(
    factorized=True, has_tables=False, pallas_ok=True, n_model=1,
    has_data_axis=False, mesh_size=1, item_shard_mode="auto",
    num_items=1000, batch_size=1024, n_test_users=100, premask=True,
)


def _sel(**kw):
    return select_tier(**{**_BASE, **kw})


def test_selection_matrix():
    """One row per tier: the documented flag combinations must resolve to
    the documented tier names."""
    # default single device -> bits
    assert _sel().name == "bits"
    # non-factorized -> bits on predict's output
    p = _sel(factorized=False, pallas_ok=False)
    assert (p.name, p.kind) == ("bits", "predict")
    # factorized + data-axis mesh -> dp-sharded bits
    p = _sel(n_model=2, has_data_axis=True, mesh_size=8)
    assert (p.name, p.dp) == ("bits_dp", True)
    # big catalog on a 2-D mesh -> composed item-sharded bits
    p = _sel(n_model=2, has_data_axis=True, mesh_size=8,
             num_items=tiers.item_shard_threshold(1024) + 1)
    assert (p.name, p.item_shard, p.bits) == ("item_shard_bits", True, True)
    # forced item shard engages below the threshold too
    p = _sel(n_model=2, has_data_axis=True, mesh_size=8,
             item_shard_mode="on")
    assert p.name == "item_shard_bits"
    # item shard needs a factorized model
    p = _sel(factorized=False, pallas_ok=False, n_model=2,
             has_data_axis=True, mesh_size=8, item_shard_mode="on")
    assert p.name == "bits" and not p.item_shard
    # premask off -> legacy tiers: pallas (TPU/interpret), then scatter
    assert _sel(premask=False).name == "pallas"
    p = _sel(premask=False, mesh_size=8, has_data_axis=True)
    assert p.name == "pallas_dp"
    assert _sel(premask=False, pallas_ok=False).name == "scatter"
    p = _sel(premask=False, n_model=2, has_data_axis=True, mesh_size=8,
             item_shard_mode="on")
    assert p.name == "item_shard_rows"
    # premask off + no pallas: item shard cannot engage at all
    p = _sel(premask=False, pallas_ok=False, n_model=2, has_data_axis=True,
             mesh_size=8, item_shard_mode="on")
    assert p.name == "scatter"
    # item_shard off never engages, regardless of scale
    p = _sel(n_model=2, has_data_axis=True, mesh_size=8,
             item_shard_mode="off", num_items=10_000_000, n_test_users=1)
    assert not p.item_shard
    # sampled-candidates protocol builds no bits machinery (ADVICE r4)
    p = _sel(neg_protocol=True)
    assert (p.name, p.bits) == ("scatter", False)
    # over-budget table -> streamed bits, same tier
    p = _sel(bits_budget=0)
    assert (p.name, p.table, p.stream) == ("bits", False, True)
    p = _sel(n_model=2, has_data_axis=True, mesh_size=8,
             item_shard_mode="on", bits_budget=0)
    assert (p.name, p.stream) == ("item_shard_bits", True)
    # eval_tables hook -> hoisting in the bits family
    assert _sel(has_tables=True).hoist
    assert _sel(has_tables=True, n_model=2, has_data_axis=True, mesh_size=8,
                item_shard_mode="on").hoist
    assert not _sel(has_tables=True, premask=False).hoist


def test_bits_budget_env_override(monkeypatch):
    """NEUREC_EVAL_BITS_BUDGET forces the streamed tier without code
    (subprocess tests / memory-constrained deployments)."""
    monkeypatch.setenv("NEUREC_EVAL_BITS_BUDGET", "1")
    p = _sel()
    assert (p.name, p.stream) == ("bits", True)
    monkeypatch.setenv("NEUREC_EVAL_BITS_BUDGET", str(1 << 40))
    assert _sel().table
    monkeypatch.delenv("NEUREC_EVAL_BITS_BUDGET")
    assert _sel().table  # default budget restored


def test_item_shard_threshold_formula():
    """threshold = SCORE_BLOCK_BUDGET / (4 bytes * batch): the catalog size
    where one replicated (B, I) f32 score block exceeds the per-device
    budget."""
    assert tiers.item_shard_threshold(1024) == tiers.SCORE_BLOCK_BUDGET // 4096
    # bigger eval batches shard sooner, smaller ones later
    assert tiers.item_shard_threshold(2048) == tiers.item_shard_threshold(1024) // 2
    assert tiers.item_shard_threshold(1) == tiers.SCORE_BLOCK_BUDGET // 4


def test_shard_bits_geometry_lane_aligned():
    for num_items, n_model in [(700, 2), (98320, 2), (1024, 4), (5, 8)]:
        block, width = tiers.shard_bits_geometry(num_items, n_model)
        assert block % 1024 == 0  # per-device byte slice is 128-lane aligned
        assert width == block * n_model
        assert width >= num_items


# -- cross-tier bit-exactness ----------------------------------------------

def _fixture(seed=0, num_users=48, num_items=700, d=16):
    rng = np.random.RandomState(seed)
    train_dict, test_dict = {}, {}
    for u in range(num_users):
        items = rng.choice(num_items, size=rng.randint(6, 40), replace=False)
        n_test = max(1, len(items) // 5)
        train_dict[u] = sorted(items[:-n_test].tolist())
        test_dict[u] = sorted(items[-n_test:].tolist())
    params = {
        "u": jnp.asarray(rng.standard_normal((num_users, d)).astype(np.float32)),
        "q": jnp.asarray(rng.standard_normal((num_items, d)).astype(np.float32)),
    }

    class TinyMF:
        def predict(self, params, users):
            return params["u"][users] @ params["q"].T

        def eval_embeddings(self, params, users):
            return params["u"][users], params["q"]

    return train_dict, test_dict, params, TinyMF()


# (tier name, env, needs mesh, tiny bits budget)
_TIER_CASES = [
    ("bits", {}, False, False),
    ("bits", {}, False, True),  # streamed
    ("bits_dp", {}, True, False),
    ("pallas", {"NEUREC_EVAL_PREMASK": "0", "NEUREC_PALLAS_INTERPRET": "1"},
     False, False),
    ("pallas_dp", {"NEUREC_EVAL_PREMASK": "0", "NEUREC_PALLAS_INTERPRET": "1"},
     True, False),
    ("item_shard_bits", {"NEUREC_EVAL_ITEM_SHARD": "1"}, True, False),
    ("item_shard_bits", {"NEUREC_EVAL_ITEM_SHARD": "1"}, True, True),
    ("item_shard_rows",
     {"NEUREC_EVAL_ITEM_SHARD": "1", "NEUREC_EVAL_PREMASK": "0",
      "NEUREC_PALLAS_INTERPRET": "1"}, True, False),
]


@pytest.mark.parametrize(
    "tier,env,needs_mesh,tiny_budget", _TIER_CASES,
    ids=["%s%s" % (t, ":stream" if s else "") for t, _, _, s in _TIER_CASES],
)
def test_every_tier_matches_scatter_oracle(monkeypatch, tier, env, needs_mesh,
                                           tiny_budget):
    """Every tier, on one fixture, must reproduce the legacy scatter
    tier's metrics — single-device tiers to the exact result string,
    mesh tiers to float tolerance (cross-device metric sums reorder
    float adds)."""
    if needs_mesh and len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    train_dict, test_dict, params, model = _fixture()
    kw = dict(metric=["Precision", "Recall", "MAP", "NDCG", "MRR"],
              top_k=[5, 10, 20], batch_size=16, num_items=700)

    for var in ("NEUREC_EVAL_PREMASK", "NEUREC_PALLAS_INTERPRET",
                "NEUREC_EVAL_ITEM_SHARD"):
        monkeypatch.delenv(var, raising=False)
    # oracle: legacy scatter chain on a bare (non-factorized) predict fn
    monkeypatch.setenv("NEUREC_EVAL_PREMASK", "0")
    ev0 = UniEvaluator(train_dict, test_dict, **kw)
    bare_predict = lambda p, u: model.predict(p, u)  # no __self__
    want = ev0.evaluate(bare_predict, params)
    assert ev0._get_steps(bare_predict).plan.name == "scatter"

    for var in ("NEUREC_EVAL_PREMASK", "NEUREC_PALLAS_INTERPRET",
                "NEUREC_EVAL_ITEM_SHARD"):
        monkeypatch.delenv(var, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    if tiny_budget:
        monkeypatch.setattr(tiers, "BITS_TABLE_BUDGET", 0)
    mesh = None
    if needs_mesh:
        from neurec_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=4, n_model=2)
    ev = UniEvaluator(train_dict, test_dict, mesh=mesh, **kw)
    got = ev.evaluate(model.predict, params)
    plan = ev._get_steps(model.predict).plan
    assert plan.name == tier
    assert plan.stream == tiny_budget
    if tiny_budget:
        assert ev._bits_tables == {}, "streamed plan must not build a table"
    if needs_mesh:
        np.testing.assert_allclose(
            [float(x) for x in got.split("\t")],
            [float(x) for x in want.split("\t")],
            rtol=1e-6, atol=1e-7,
        )
    else:
        assert got == want


def test_streamed_bits_matches_table_exactly(monkeypatch):
    """Force the table under budget vs over budget: identical strings
    (the streamed pack is the same layout, packed per batch)."""
    train_dict, test_dict, params, model = _fixture(seed=3)
    kw = dict(metric=["Recall", "NDCG"], top_k=[10], batch_size=16,
              num_items=700)
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    ev_tab = UniEvaluator(train_dict, test_dict, **kw)
    want = ev_tab.evaluate(model.predict, params)
    assert ev_tab._get_steps(model.predict).plan.table

    monkeypatch.setattr(tiers, "BITS_TABLE_BUDGET", 0)
    ev_str = UniEvaluator(train_dict, test_dict, **kw)
    got = ev_str.evaluate(model.predict, params)
    assert ev_str._get_steps(model.predict).plan.stream
    assert got == want


def test_neg_protocol_builds_no_bits_table(monkeypatch):
    """Sampled-candidates protocol never reads the bits table — it must
    not be built (ADVICE r4: up to 512MB wasted per evaluator)."""
    rng = np.random.RandomState(7)
    train_dict, test_dict, params, model = _fixture(seed=7)
    neg = {}
    for u in test_dict:
        excl = set(train_dict[u]) | set(test_dict[u])
        cand = [i for i in range(700) if i not in excl]
        neg[u] = rng.choice(cand, size=30, replace=False).tolist()
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    ev = UniEvaluator(train_dict, test_dict, user_neg_test=neg,
                      metric=["Recall"], top_k=[10], batch_size=16,
                      num_items=700)
    ev.evaluate(model.predict, params)
    assert not ev._get_steps(model.predict).needs_bits
    assert ev._bits_tables == {}


# -- composed big-catalog path (VERDICT r4 #1) ------------------------------

@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_item_shard_bits_big_catalog_identity_and_hlo(monkeypatch):
    """At a >= threshold catalog on the (4,2) mesh, the auto-engaged
    item_shard_bits tier must (a) reproduce the replicated bits path's
    result string EXACTLY (the merge is tie-exact), and (b) compile to
    per-device (B_loc, I_m) score blocks with no full-width f32 buffer
    anywhere in the post-SPMD HLO."""
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    monkeypatch.delenv("NEUREC_EVAL_ITEM_SHARD", raising=False)
    from neurec_tpu.parallel.mesh import make_mesh

    num_items = tiers.item_shard_threshold(1024) + 16
    n_users, d = 8, 8
    rng = np.random.RandomState(1)
    params = {
        "u": jnp.asarray(rng.standard_normal((n_users, d)).astype(np.float32)),
        "q": jnp.asarray(
            rng.standard_normal((num_items, d)).astype(np.float32)
        ),
    }

    class TinyMF:
        def predict(self, params, users):
            return params["u"][users] @ params["q"].T

        def eval_embeddings(self, params, users):
            return params["u"][users], params["q"]

    model = TinyMF()
    train = {u: sorted(rng.choice(num_items, 64, replace=False).tolist())
             for u in range(n_users)}
    test = {u: [int(rng.randint(num_items))] for u in range(n_users)}
    kw = dict(metric=["Recall", "NDCG"], top_k=[20], num_items=num_items)

    n_data, n_model = 4, 2
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    ev = UniEvaluator(train, test, mesh=mesh, **kw)
    sharded_params = {
        "u": jax.device_put(
            params["u"],
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        ),
        "q": jax.device_put(
            params["q"],
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("model", None)
            ),
        ),
    }
    got = ev.evaluate(model.predict, sharded_params)
    program = ev._get_steps(model.predict)
    assert program.plan.name == "item_shard_bits"

    ev_rep = UniEvaluator(train, test, **kw)
    want = ev_rep.evaluate(model.predict, params)
    assert ev_rep._get_steps(model.predict).plan.name == "bits"
    assert got == want, "sharded merge is exact — strings must be identical"

    # post-SPMD HLO: per-device (B_loc, I_m) blocks only
    bits = ev._get_bits_table(program.plan.pack_block, program.plan.bits_width)
    users_b, sel_b, valid_b = ev._default_batches
    txt = (
        program.full_all.lower(sharded_params, users_b, sel_b, valid_b, bits)
        .compile()
        .as_text()
    )
    B = users_b.shape[1]
    I_m, width = program.plan.pack_block, program.plan.bits_width
    assert "f32[%d,%d]" % (B // n_data, I_m) in txt, (
        "expected per-device score block f32[%d,%d]" % (B // n_data, I_m)
    )
    for full in ("f32[%d,%d]" % (B, width), "f32[%d,%d]" % (B, num_items),
                 "f32[%d,%d]" % (B // n_data, width)):
        assert full not in txt, (
            "full-width score buffer %s found in compiled HLO — eval is "
            "not item-sharded" % full
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_eval_tables_hoisted_under_item_shard(monkeypatch):
    """Graph-style models (eval_tables hook) must have their table
    computation hoisted out of the per-batch scan under the item-sharded
    tier too — previously the >=100k path re-propagated per batch
    (VERDICT r4: evaluator.py:417,581-583)."""
    monkeypatch.setenv("NEUREC_EVAL_ITEM_SHARD", "1")
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    from neurec_tpu.parallel.mesh import make_mesh

    train_dict, test_dict, params, model = _fixture(seed=5)
    calls = {"tables": 0, "embeddings": 0}

    class TablesMF:
        def predict(self, p, users):
            return p["u"][users] @ p["q"].T

        def eval_embeddings(self, p, users):
            calls["embeddings"] += 1
            return p["u"][users], p["q"]

        def eval_tables(self, p):
            calls["tables"] += 1
            return p["u"], p["q"]

    tm = TablesMF()
    mesh = make_mesh(n_data=4, n_model=2)
    ev = UniEvaluator(train_dict, test_dict, metric=["Recall"], top_k=[10],
                      batch_size=16, num_items=700, mesh=mesh)
    got = ev.evaluate(tm.predict, params)
    plan = ev._get_steps(tm.predict).plan
    assert plan.name == "item_shard_bits" and plan.hoist
    assert calls["tables"] >= 1, "eval_tables hook not used"
    assert calls["embeddings"] == 0, (
        "item-sharded path still calls per-batch eval_embeddings"
    )

    # identity vs the plain replicated evaluator
    monkeypatch.setenv("NEUREC_EVAL_ITEM_SHARD", "0")
    ev0 = UniEvaluator(train_dict, test_dict, metric=["Recall"], top_k=[10],
                       batch_size=16, num_items=700)
    want = ev0.evaluate(model.predict, params)
    np.testing.assert_allclose(
        [float(x) for x in got.split("\t")],
        [float(x) for x in want.split("\t")],
        rtol=1e-6, atol=1e-7,
    )
