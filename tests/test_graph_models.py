"""Graph family: SpMM correctness, LightGCN/NGCF/SpectralCF smoke + learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from neurec_tpu.data.dataset import Dataset
from neurec_tpu.models import get_model
from neurec_tpu.ops.graph import build_norm_adjacency, spmm
from neurec_tpu.trainer import Trainer
from tests.helpers import (
    assert_eval_embeddings_parity,
    make_config,
    make_synthetic_dataset,
)


class SilentLogger:
    def info(self, msg):
        pass

    debug = warning = error = critical = info


def test_spmm_matches_scipy():
    rng = np.random.RandomState(0)
    R = sp.random(30, 40, density=0.2, random_state=rng, format="csr")
    R.data[:] = 1.0
    for adj_type in ("plain", "norm", "gcmc", "pre", "mean"):
        adj = build_norm_adjacency(R, adj_type, pad_multiple=64)
        # reconstruct scipy equivalent
        n = 70
        tmp = sp.csr_matrix(
            (np.ones(R.nnz), (R.tocoo().row, R.tocoo().col + 30)), shape=(n, n)
        )
        A = tmp + tmp.T
        if adj_type == "plain":
            M = A
        elif adj_type == "norm":
            A2 = A + sp.eye(n)
            d = np.asarray(A2.sum(1)).ravel()
            d_inv = np.divide(1.0, d, out=np.zeros_like(d), where=d > 0)
            M = sp.diags(d_inv) @ A2
        elif adj_type == "gcmc":
            d = np.asarray(A.sum(1)).ravel()
            d_inv = np.divide(1.0, d, out=np.zeros_like(d), where=d > 0)
            M = sp.diags(d_inv) @ A
        elif adj_type == "pre":
            d = np.asarray(A.sum(1)).ravel()
            d_inv = np.divide(1.0, np.sqrt(d), out=np.zeros_like(d), where=d > 0)
            M = sp.diags(d_inv) @ A @ sp.diags(d_inv)
        else:
            d = np.asarray(A.sum(1)).ravel()
            d_inv = np.divide(1.0, d, out=np.zeros_like(d), where=d > 0)
            M = sp.diags(d_inv) @ A + sp.eye(n)
        x = rng.randn(n, 8).astype(np.float32)
        got = np.asarray(spmm(adj, jnp.asarray(x)))
        want = np.asarray(M @ x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


GRAPH_PROPS = {
    "LightGCN": {
        "lr": 0.05, "reg": 1e-4, "embed_size": 16, "n_layers": 3,
        "batch_size": 256, "epochs": 25, "learner": "adam",
        "adj_type": "pre", "verbose": 25,
    },
    "NGCF": {
        "epochs": 5, "batch_size": 256, "embedding_size": 8,
        "layer_size": "[8,8]", "learning_rate": 0.01,
        "node_dropout_flag": "True", "adj_type": "norm", "alg_type": "ngcf",
        "loss_function": "BPR", "learner": "adam", "reg": 0.0,
        "node_dropout_ratio": 0.1, "mess_dropout_ratio": 0.1,
        "embed_init_method": "xavier_normal",
        "weight_init_method": "xavier_normal", "stddev": 0.01, "verbose": 5,
    },
    "SpectralCF": {
        "epochs": 5, "batch_size": 256, "embedding_size": 16,
        "learning_rate": 0.01, "num_layers": 2, "activation": "sigmoid",
        "loss_function": "BPR", "learner": "adam", "reg": 0.001,
        "embed_init_method": "xavier_normal",
        "weight_init_method": "xavier_normal", "stddev": 0.01, "verbose": 5,
    },
}


@pytest.fixture(scope="module")
def graph_dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("graph")
    make_synthetic_dataset(tmp_path)
    return tmp_path


@pytest.mark.parametrize("name", sorted(GRAPH_PROPS))
def test_graph_model_smoke(graph_dataset, name):
    conf = make_config(graph_dataset, recommender=name, alg_props=GRAPH_PROPS[name])
    dataset = Dataset(conf)
    model = get_model(name)(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.initialize()
    key = jax.random.PRNGKey(0)
    losses = []
    for e in range(3):
        trainer.params, trainer.opt_state, loss = trainer._epoch_fn(
            trainer.params, trainer.opt_state, jax.random.fold_in(key, e), e + 1
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] <= losses[0]
    assert_eval_embeddings_parity(model, trainer.params)
    result = trainer.evaluate()
    assert len(result.split("\t")) == 10


def test_lightgcn_learns(graph_dataset):
    conf = make_config(
        graph_dataset, recommender="LightGCN", alg_props=GRAPH_PROPS["LightGCN"]
    )
    dataset = Dataset(conf)
    model = get_model("LightGCN")(dataset, conf)
    trainer = Trainer(model, dataset, conf, logger=SilentLogger())
    trainer.train()
    raw = trainer.evaluator.evaluator.evaluate_raw(model.predict, trainer.params)
    ndcg10 = raw[2, 0]
    assert ndcg10 > 0.15, "LightGCN NDCG@10=%.4f" % ndcg10


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_lightgcn_sharded(graph_dataset):
    from neurec_tpu.parallel.mesh import make_mesh

    conf = make_config(
        graph_dataset, recommender="LightGCN",
        alg_props=dict(GRAPH_PROPS["LightGCN"], epochs=2, verbose=2),
    )
    dataset = Dataset(conf)
    model = get_model("LightGCN")(dataset, conf)
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(model, dataset, conf, mesh=mesh, logger=SilentLogger())
    result = trainer.train()
    assert len(result.split("\t")) == 10


def test_padded_coo_rows_stay_sorted_for_segment_sum():
    """segment_sum is called with indices_are_sorted=True; the padding
    edges appended after the row-sorted real edges must therefore repeat
    the LAST row id (value 0 keeps them no-ops) — row-0 pads broke the
    promise, which is implementation-defined territory for XLA scatter
    (review r5). Covers both the replicated build and the per-block
    sharded layout."""
    rng = np.random.RandomState(7)
    m = sp.random(60, 45, density=0.05, random_state=rng, format="csr")
    m.data[:] = 1.0
    adj = build_norm_adjacency(m, adj_type="pre", pad_multiple=64)
    assert np.all(np.diff(adj.rows) >= 0)
    nnz = (adj.vals != 0).sum()
    assert len(adj.rows) > nnz  # padding actually present in this fixture
    # SpMM still matches scipy with the new pad layout
    norm = sp.csr_matrix(
        (adj.vals[:nnz], (adj.rows[:nnz], adj.cols[:nnz])),
        shape=(adj.n_nodes, adj.n_nodes),
    )
    x = rng.randn(adj.n_nodes, 8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(spmm(adj, jnp.asarray(x))), norm @ x, rtol=1e-5, atol=1e-5
    )

    from neurec_tpu.ops.graph import shard_adjacency
    from neurec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_adjacency(adj, mesh, pad_multiple=64, with_pallas=False)
    rl = np.asarray(sharded.rows_local)
    for b in range(rl.shape[0]):
        assert np.all(np.diff(rl[b]) >= 0)
