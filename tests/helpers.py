"""Shared test fixtures: synthetic datasets and configs."""

import numpy as np


def make_synthetic_dataset(tmp_path, num_users=60, num_items=80, seed=0,
                           min_items=8, max_items=25, clustered=True):
    """Write a synthetic .rating file with learnable block structure.

    Users and items are split into 4 latent groups; users mostly interact
    with items of their own group, so a factorization model can beat random
    ranking after a few epochs.
    """
    rng = np.random.RandomState(seed)
    rows = []
    for u in range(num_users):
        g = u % 4
        n = rng.randint(min_items, max_items)
        if clustered:
            own = [i for i in range(num_items) if i % 4 == g]
            k_own = int(n * 0.8)
            items = rng.choice(own, size=min(k_own, len(own)), replace=False).tolist()
            others = [i for i in range(num_items) if i % 4 != g]
            items += rng.choice(others, size=n - len(items), replace=False).tolist()
            rng.shuffle(items)  # interleave groups so a time split stays learnable
        else:
            items = rng.choice(num_items, size=n, replace=False).tolist()
        for t, i in enumerate(items):
            rows.append((u, i, 1.0, t))
    path = tmp_path / "synth.rating"
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    return path


def assert_eval_embeddings_parity(model, params, num_check=5):
    """Models defining ``eval_embeddings`` must factor ``predict`` exactly:
    u_vecs @ item_table.T == predict(params, users) for the evaluator's
    fused Pallas score+mask path to be score-exact."""
    import jax.numpy as jnp

    ee = getattr(model, "eval_embeddings", None)
    if ee is None:
        return
    users = jnp.arange(num_check, dtype=jnp.int32)
    u_vecs, table = ee(params, users)
    got = np.asarray(u_vecs.astype(jnp.float32) @ table.astype(jnp.float32).T)
    want = np.asarray(model.predict(params, users)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def make_config(tmp_path, recommender="MF", alg_props=None, **overrides):
    from neurec_tpu.config import Config

    base = {
        "recommender": recommender,
        "config_dir": str(tmp_path),
        "data.input.path": str(tmp_path),
        "data.input.dataset": "synth",
        "data.column.format": "UIRT",
        "data.convert.separator": "'\\t'",
        "user_min": "0",
        "item_min": "0",
        "splitter": "ratio",
        "ratio": "0.8",
        "by_time": "True",
        "rec.evaluate.neg": "0",
        "metric": '["Precision", "Recall", "NDCG", "MAP", "MRR"]',
        "topk": "[10, 20]",
        "group_view": "None",
        "test_batch_size": "64",
        "num_thread": "8",
    }
    base.update({k: str(v) for k, v in overrides.items()})
    lib = tmp_path / "NeuRec.properties"
    lib.write_text(
        "[default]\n" + "\n".join("%s=%s" % kv for kv in base.items()) + "\n"
    )
    alg = tmp_path / ("%s.properties" % recommender)
    lines = ["[hyperparameters]"]
    for k, v in (alg_props or {}).items():
        lines.append("%s=%s" % (k, v))
    alg.write_text("\n".join(lines) + "\n")
    return Config(str(lib), cmd_args=[])
