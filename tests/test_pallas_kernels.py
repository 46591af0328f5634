"""Pallas masked-scores kernel vs the XLA reference formulation.

Runs in interpreter mode on the CPU test platform; the compiled path is
exercised on real TPU by the benchmark/evaluator.
"""

import jax.numpy as jnp
import numpy as np

from neurec_tpu.ops.pallas_kernels import masked_scores


def _reference(u, items, rows, num_items):
    scores = np.asarray(u @ items.T, dtype=np.float32)
    for b in range(rows.shape[0]):
        for it in rows[b]:
            if it < num_items:
                scores[b, it] = -np.inf
    return scores


def test_masked_scores_interpret():
    rng = np.random.RandomState(0)
    B, I, d, L = 16, 700, 32, 40
    u = rng.randn(B, d).astype(np.float32)
    items = rng.randn(I, d).astype(np.float32)
    rows = np.full((B, L), I, dtype=np.int32)
    for b in range(B):
        n = rng.randint(1, L)
        rows[b, :n] = np.sort(rng.choice(I, size=n, replace=False))

    got = np.asarray(
        masked_scores(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(rows),
            block_items=256, interpret=True,
        )
    )
    want = _reference(u, items, rows, I)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_masked_scores_long_train_rows():
    """Gowalla-power-user regime: L >= 1024 must neither blow compile nor
    change results (the old unrolled-compare kernel was O(L) in both)."""
    rng = np.random.RandomState(2)
    B, I, d, L = 8, 1500, 16, 1200
    u = rng.randn(B, d).astype(np.float32)
    items = rng.randn(I, d).astype(np.float32)
    rows = np.full((B, L), I, dtype=np.int32)
    for b in range(B):
        n = rng.randint(L // 2, L)
        rows[b, :n] = np.sort(rng.choice(I, size=n, replace=False))

    got = np.asarray(
        masked_scores(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(rows),
            block_items=512, interpret=True,
        )
    )
    want = _reference(u, items, rows, I)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_build_train_mask_drops_out_of_range():
    from neurec_tpu.ops.pallas_kernels import build_train_mask

    rows = jnp.asarray([[0, 2, 9, 9], [1, 9, 9, 9]], jnp.int32)
    mask = np.asarray(build_train_mask(rows, 5))
    want = np.zeros((2, 5), np.int8)
    want[0, [0, 2]] = 1
    want[1, 1] = 1
    np.testing.assert_array_equal(mask, want)


def test_masked_scores_no_mask():
    rng = np.random.RandomState(1)
    B, I, d = 8, 300, 16
    u = rng.randn(B, d).astype(np.float32)
    items = rng.randn(I, d).astype(np.float32)
    rows = np.full((B, 4), I, dtype=np.int32)  # all padding: no masking
    got = np.asarray(
        masked_scores(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(rows),
            block_items=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, u @ items.T, rtol=1e-5, atol=1e-5)


def _mf_setup(tmp_path, mesh=None):
    from neurec_tpu.data.dataset import Dataset
    from neurec_tpu.eval.evaluator import Evaluator
    from neurec_tpu.models import get_model
    from neurec_tpu.trainer import Trainer
    from tests.helpers import make_config, make_synthetic_dataset

    make_synthetic_dataset(tmp_path)
    conf = make_config(
        tmp_path,
        recommender="MF",
        alg_props={
            "epochs": 1, "batch_size": 128, "embedding_size": 8,
            "reg_mf": 0.0, "learning_rate": 0.05, "learner": "adam",
            "num_negatives": 1, "is_pairwise": "True",
            "loss_function": "bpr", "init_method": "normal",
            "stddev": 0.1, "verbose": 1,
        },
    )
    dataset = Dataset(conf)
    model = get_model("MF")(dataset, conf)
    trainer = Trainer(model, dataset, conf, mesh=mesh, logger=None)
    trainer.initialize()
    ev = Evaluator.from_dataset(dataset, conf, mesh=mesh)
    return model, trainer.params, ev


def test_evaluator_pallas_path_matches_xla(tmp_path, monkeypatch):
    """End-to-end: the evaluator's fused Pallas score+mask path (forced via
    NEUREC_PALLAS_INTERPRET on the CPU platform, bits path disabled) must
    reproduce the XLA scatter path's result string exactly at %.8f
    precision."""
    monkeypatch.setenv("NEUREC_EVAL_PREMASK", "0")
    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    model, params, ev_xla = _mf_setup(tmp_path)
    want = ev_xla.evaluate(model.predict, params)

    monkeypatch.setenv("NEUREC_PALLAS_INTERPRET", "1")
    _, _, ev_pl = _mf_setup(tmp_path)
    got = ev_pl.evaluate(model.predict, params)
    assert got == want


def test_bits_path_partitions_under_mesh(tmp_path, monkeypatch):
    """The default XLA bit-plane eval path must be partitioned by GSPMD
    over 'data' on a mesh: the compiled program's main score matmul runs
    on the per-device batch slice (asserted via the post-SPMD HLO), and
    the numerics match the single-device run."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from neurec_tpu.parallel.mesh import make_mesh

    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    model, params, ev_single = _mf_setup(tmp_path)
    want = ev_single.evaluate(model.predict, params)

    n_data = 4
    mesh = make_mesh(n_data=n_data, n_model=2)
    _, _, ev_mesh = _mf_setup(tmp_path, mesh=mesh)
    uni = ev_mesh.evaluator
    got = ev_mesh.evaluate(model.predict, params)
    np.testing.assert_allclose(
        [float(x) for x in got.split("	")],
        [float(x) for x in want.split("	")],
        rtol=1e-6, atol=1e-7,
    )
    assert uni._get_steps(model.predict)[2], "bits path did not engage"

    # post-SPMD HLO: the (B, I_p8) score/mask intermediates must appear at
    # the per-device batch slice, never at the full batch size
    full_all = uni._get_steps(model.predict)[0]
    bits = uni._get_bits_table()
    users_b, sel_b, valid_b = uni._default_batches
    txt = (
        full_all.lower(params, users_b, sel_b, valid_b, bits)
        .compile()
        .as_text()
    )
    full_B = users_b.shape[1]
    i_p8 = uni._items_pad8
    per_dev = "f32[%d,%d]" % (full_B // n_data, i_p8)
    replicated = "f32[%d,%d]" % (full_B, i_p8)
    assert per_dev in txt, (
        "expected per-device score block %s in compiled HLO" % per_dev
    )
    assert replicated not in txt, (
        "full-batch score block %s found in compiled HLO — eval is not "
        "partitioned over 'data'" % replicated
    )


def test_evaluator_pallas_mesh_actually_partitions(tmp_path, monkeypatch):
    """Regression test for d986820: with the DEFAULT item-shard mode (auto,
    sub-threshold catalog) on a multi-device mesh, the Pallas masked-scores
    kernel must be shard_map-partitioned over the 'data' axis — i.e. traced
    with the per-device batch slice, not the full batch. Numerics cannot
    catch this (replication preserves values); traced shapes can."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from neurec_tpu.ops import pallas_kernels
    from neurec_tpu.parallel.mesh import make_mesh

    recorded = []
    real_rows = pallas_kernels.masked_scores

    def spy_rows(u_vecs, item_table, train_rows, **kw):
        recorded.append(tuple(u_vecs.shape))
        return real_rows(u_vecs, item_table, train_rows, **kw)

    monkeypatch.setattr(pallas_kernels, "masked_scores", spy_rows)
    monkeypatch.setenv("NEUREC_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("NEUREC_EVAL_ITEM_SHARD", raising=False)
    # force the Pallas masked-scores path: the default bits path is plain
    # XLA (GSPMD-partitioned; covered by
    # test_bits_path_partitions_under_mesh), while this test guards the
    # shard_map wrap of the pallas_call fallback
    monkeypatch.setenv("NEUREC_EVAL_PREMASK", "0")

    n_data = 4
    mesh = make_mesh(n_data=n_data, n_model=2)
    model, params, ev = _mf_setup(tmp_path, mesh=mesh)
    uni = ev.evaluator
    assert uni._item_shard_mode() == "auto"
    assert uni.num_items < 100_000
    ev.evaluate(model.predict, params)

    # replicate evaluate_raw's batch-size computation to get the full B
    full_B = min(uni.batch_size, max(len(uni.test_users), 1))
    full_B = -(-full_B // n_data) * n_data
    assert recorded, "Pallas eval path did not engage"
    assert all(s[0] == full_B // n_data for s in recorded), (
        "masked_scores traced with batch dims %r; expected the per-device "
        "slice %d of full batch %d — the kernel is running unpartitioned "
        "under the mesh" % (sorted({s[0] for s in recorded}), full_B // n_data, full_B)
    )


def test_eval_item_shard_on_nonfactorized_fallback(tmp_path, monkeypatch):
    """eval_item_shard=on with a model lacking eval_embeddings on a
    multi-device mesh must warn and fall back, not crash (ADVICE r3:
    UnboundLocalError from the misplaced shard_map block reaching
    ``masked_fn`` with masked_fn never defined)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from neurec_tpu.parallel.mesh import make_mesh

    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("NEUREC_EVAL_ITEM_SHARD", "1")
    mesh = make_mesh(n_data=4, n_model=2)
    model, params, ev = _mf_setup(tmp_path, mesh=mesh)
    monkeypatch.setattr(model, "eval_embeddings", None)
    out = ev.evaluate(model.predict, params)  # must not raise
    assert len(out.split("\t")) == 10


def test_evaluator_pallas_path_under_mesh(tmp_path, monkeypatch):
    """The shard_map-partitioned Pallas path on the 8-device mesh must match
    the single-device XLA path."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from neurec_tpu.parallel.mesh import make_mesh

    model, params, ev_xla = _mf_setup(tmp_path)
    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    want = ev_xla.evaluate(model.predict, params)

    monkeypatch.setenv("NEUREC_PALLAS_INTERPRET", "1")
    mesh = make_mesh(n_data=4, n_model=2)
    _, _, ev_pl = _mf_setup(tmp_path, mesh=mesh)
    got = ev_pl.evaluate(model.predict, params)
    # cross-device metric summation reorders float adds: numeric, not
    # string, equality
    np.testing.assert_allclose(
        [float(x) for x in got.split("\t")],
        [float(x) for x in want.split("\t")],
        rtol=1e-6, atol=1e-7,
    )


def test_pack_train_bits_xla_expansion_roundtrip():
    """Global-bit-plane packing + the XLA expansion used by the
    evaluator's default bits path must reproduce build_train_mask
    exactly, including the 8-pad tail."""
    import jax.numpy as jnp

    from neurec_tpu.ops.pallas_kernels import build_train_mask, pack_train_bits

    rng = np.random.RandomState(5)
    B, I, L = 16, 1203, 60  # I deliberately not a multiple of 8
    rows = np.full((B, L), I, dtype=np.int32)
    for b in range(B):
        n = rng.randint(1, L)
        rows[b, :n] = np.sort(rng.choice(I, size=n, replace=False))

    i_p8 = I + ((-I) % 8)
    bits = pack_train_bits(jnp.asarray(rows), I, block_items=i_p8)
    planes = jnp.arange(8, dtype=jnp.uint8)
    hit = (
        (bits[:, None, :] >> planes[None, :, None]) & jnp.uint8(1)
    ).reshape(B, i_p8)
    want = np.asarray(build_train_mask(jnp.asarray(rows), i_p8))
    np.testing.assert_array_equal(np.asarray(hit), want)


def test_evaluator_bits_path_matches_scatter_path(tmp_path, monkeypatch):
    """The evaluator's default XLA bit-plane-masked path must reproduce
    the legacy scatter path's result string exactly."""
    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("NEUREC_EVAL_PREMASK", "0")
    model, params, ev_scatter = _mf_setup(tmp_path)
    want = ev_scatter.evaluate(model.predict, params)
    assert not ev_scatter.evaluator._get_steps(model.predict)[2]

    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    _, _, ev_bits = _mf_setup(tmp_path)
    got = ev_bits.evaluate(model.predict, params)
    assert ev_bits.evaluator._get_steps(model.predict)[2]
    assert got == want


def test_nonfactorized_bits_path_matches_scatter(tmp_path, monkeypatch):
    """Models without eval_embeddings also take the fused bit-plane mask
    by default; it must reproduce the legacy scatter chain exactly."""
    monkeypatch.delenv("NEUREC_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("NEUREC_EVAL_PREMASK", "0")
    model, params, ev_scatter = _mf_setup(tmp_path)
    monkeypatch.setattr(model, "eval_embeddings", None)
    want = ev_scatter.evaluate(model.predict, params)

    monkeypatch.delenv("NEUREC_EVAL_PREMASK", raising=False)
    _, _, ev_bits = _mf_setup(tmp_path)
    got = ev_bits.evaluate(model.predict, params)
    assert ev_bits.evaluator._get_steps(model.predict)[2]
    assert got == want
