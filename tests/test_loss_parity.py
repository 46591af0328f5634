"""Differential loss-parity tests: literal numpy transcriptions of the
reference's trickiest loss constructions vs our jitted implementations.

Learning tests show models train; these prove the MATH is the reference's,
term by term, on small random instances (same pattern as the GRU4RecPlus
bpr-max/top1-max differential in test_sequential_models.py).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_apr_adversarial_loss_matches_reference_math():
    """APR adv='grad' (reference model/general_recommender/APR.py:73-119):
    FGSM deltas = eps * row-l2-normalized d(bpr)/d(table) with stop-grad,
    opt_loss = bpr + reg*l2(P,Q) + reg_adv * bpr(P+dP, Q+dQ)."""
    import types

    from neurec_tpu.models.general.apr import APR

    rng = np.random.RandomState(0)
    U, I, d, B = 7, 9, 4, 12
    P = rng.standard_normal((U, d)).astype(np.float32)
    Q = rng.standard_normal((I, d)).astype(np.float32)
    users = rng.randint(0, U, B).astype(np.int32)
    pos = rng.randint(0, I, B).astype(np.int32)
    neg = rng.randint(0, I, B).astype(np.int32)
    w = np.ones(B, np.float32)
    reg, reg_adv, eps = 0.03, 1.0, 0.5

    # ---- literal reference transcription (numpy) ----
    y = np.sum(P[users] * (Q[pos] - Q[neg]), axis=-1)
    base = np.sum(np.log1p(np.exp(-y)))  # softplus(-y) summed
    # tf.nn.l2_loss = sum(t^2)/2
    l2 = 0.5 * (np.sum(P * P) + np.sum(Q * Q))
    # full-table grads of `base` (APR.py:110-113 converts the sparse
    # IndexedSlices to dense; untouched rows stay zero)
    s = _sigmoid(-y)  # d softplus(-y)/dy = -sigmoid(-y)
    gP = np.zeros_like(P)
    gQ = np.zeros_like(Q)
    for i in range(B):
        gP[users[i]] += -s[i] * (Q[pos[i]] - Q[neg[i]])
        gQ[pos[i]] += -s[i] * P[users[i]]
        gQ[neg[i]] += s[i] * P[users[i]]

    def l2norm_rows(x):  # tf.nn.l2_normalize(x, 1)
        n = np.sqrt(np.maximum(np.sum(x * x, axis=1, keepdims=True), 1e-12))
        return x / n

    dP = l2norm_rows(gP) * eps
    dQ = l2norm_rows(gQ) * eps
    y_adv = np.sum((P + dP)[users] * ((Q + dQ)[pos] - (Q + dQ)[neg]), axis=-1)
    adv = np.sum(np.log1p(np.exp(-y_adv)))
    want = base + reg * l2 + reg_adv * adv

    # ---- our implementation ----
    model = types.SimpleNamespace(
        reg=reg, reg_adv=reg_adv, adv="grad", adver=True, eps=eps,
        adv_epoch=0,
    )
    model._bpr = types.MethodType(APR._bpr, model)
    batch = {
        "users": jnp.asarray(users), "pos_items": jnp.asarray(pos),
        "neg_items": jnp.asarray(neg), "rng": jax.random.PRNGKey(0),
        "epoch": jnp.int32(5),
    }
    params = {"embedding_P": jnp.asarray(P), "embedding_Q": jnp.asarray(Q)}
    got = float(APR.loss(model, params, batch, jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_apr_adv_gate_respects_adv_epoch():
    """Before adv_epoch the adversarial term must be off (APR phase-in)."""
    import types

    from neurec_tpu.models.general.apr import APR
    from neurec_tpu.ops.losses import l2_loss

    rng = np.random.RandomState(1)
    U, I, d, B = 5, 6, 3, 8
    params = {
        "embedding_P": jnp.asarray(rng.standard_normal((U, d)).astype(np.float32)),
        "embedding_Q": jnp.asarray(rng.standard_normal((I, d)).astype(np.float32)),
    }
    batch = {
        "users": jnp.asarray(rng.randint(0, U, B).astype(np.int32)),
        "pos_items": jnp.asarray(rng.randint(0, I, B).astype(np.int32)),
        "neg_items": jnp.asarray(rng.randint(0, I, B).astype(np.int32)),
        "rng": jax.random.PRNGKey(0),
        "epoch": jnp.int32(3),  # < adv_epoch
    }
    w = jnp.ones(B)
    model = types.SimpleNamespace(
        reg=0.01, reg_adv=1.0, adv="grad", adver=True, eps=0.5, adv_epoch=10,
    )
    model._bpr = types.MethodType(APR._bpr, model)
    gated = float(APR.loss(model, params, batch, w))
    y = jnp.sum(
        params["embedding_P"][batch["users"]]
        * (params["embedding_Q"][batch["pos_items"]]
           - params["embedding_Q"][batch["neg_items"]]),
        axis=-1,
    )
    plain = float(
        jnp.sum(jax.nn.softplus(-y))
        + 0.01 * l2_loss(params["embedding_P"], params["embedding_Q"])
    )
    np.testing.assert_allclose(gated, plain, rtol=1e-6)


def test_wrmf_solve_matches_reference_closed_form():
    """WRMF per-row ALS (reference WRMF.py:49-60): solve
    (Y^T Y + Y^T Cu Y + lambda I) x = Y^T (Cu + 1) p_u with Cu = alpha * r_u
    (r binary, WRMF.py:27-33). Our batched ``_solve_side`` must reproduce
    the dense numpy solve row-for-row, including the zero-pad algebra."""
    import types

    from neurec_tpu.models.general.wrmf import WRMF

    rng = np.random.RandomState(2)
    U, I, d = 6, 10, 5
    alpha, reg = 2.0, 0.1
    Y = rng.standard_normal((I, d)).astype(np.float32)
    R = (rng.rand(U, I) < 0.35).astype(np.float32)
    R[0] = 0.0  # a user with no interactions must still solve (b = 0)

    # reference dense solve per user
    want = np.zeros((U, d), np.float32)
    for u in range(U):
        Cu = alpha * R[u]
        A = Y.T @ Y + Y.T @ np.diag(Cu) @ Y + reg * np.eye(d)
        b = Y.T @ ((Cu + 1.0) * R[u])
        want[u] = np.linalg.solve(A, b)

    # our padded-row formulation
    L = max(int(R.sum(axis=1).max()), 1)
    rows = np.full((U, L), I, np.int32)  # pad == num_items
    for u in range(U):
        items = np.where(R[u] > 0)[0]
        rows[u, : len(items)] = items

    model = types.SimpleNamespace(embedding_size=d, alpha=alpha, reg_mf=reg)
    got = np.asarray(
        WRMF._solve_side(model, jnp.asarray(Y), jnp.asarray(rows))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transrec_scores_match_reference_math():
    """TransRec mirrors the reference's train-vs-eval convention: training
    score = b_i - ||u+g+prev-i||^2 (squared, TransRec.py:69-79) while eval
    uses the unsquared euclidean norm (tf.norm, TransRec.py:18-19,105-110).
    Both transcribed literally in numpy."""
    import types

    from neurec_tpu.models.sequential.transrec import TransRec

    rng = np.random.RandomState(4)
    U, I, d, B = 6, 9, 5, 10
    params = {
        "user_emb": jnp.asarray(rng.standard_normal((U, d)).astype(np.float32)),
        "item_emb": jnp.asarray(rng.standard_normal((I, d)).astype(np.float32)),
        "item_bias": jnp.asarray(rng.standard_normal(I).astype(np.float32)),
        "global_emb": jnp.asarray(rng.standard_normal((1, d)).astype(np.float32)),
    }
    users = rng.randint(0, U, B).astype(np.int32)
    recent = rng.randint(0, I, B).astype(np.int32)
    items = rng.randint(0, I, B).astype(np.int32)

    # training score (squared distance)
    model = types.SimpleNamespace(embedding_size=d)
    y, _ = TransRec._score(
        model, params, jnp.asarray(users), jnp.asarray(recent),
        jnp.asarray(items),
    )
    P = np.asarray(params["user_emb"]); Q = np.asarray(params["item_emb"])
    g = np.asarray(params["global_emb"])[0]; b = np.asarray(params["item_bias"])
    vec = P[users] + g + Q[recent] - Q[items]
    want_train = b[items] - np.sum(vec * vec, axis=1)
    np.testing.assert_allclose(np.asarray(y), want_train, rtol=1e-5)

    # eval score (euclidean norm over the full catalog); _recent_items is
    # a PER-USER table (num_users, high_order) — predict takes its last col
    recent_table = rng.randint(0, I, (U, 1)).astype(np.int32)
    model_e = types.SimpleNamespace(_recent_items=recent_table)
    scores = np.asarray(
        TransRec.predict(model_e, params, jnp.asarray(users))
    )
    pre = P[users] + g + Q[recent_table[users, -1]]
    want_eval = b[None, :] - np.sqrt(
        np.maximum(np.sum((pre[:, None, :] - Q[None, :, :]) ** 2, axis=2),
                   1e-12)
    )
    np.testing.assert_allclose(scores, want_eval, rtol=1e-4, atol=1e-5)
