"""DMF — deep matrix factorization (Xue et al., IJCAI 2017).

Reference counterpart: model/general_recommender/DMF.py. The reference
class is NOT runnable: its ``predict`` calls
``self.user_matrix.getrow(user_id.toarray(), [self.num_items])``
(DMF.py:117-131) which raises before scoring a single user, so it ships no
reachable behavior to mirror beyond the tower shapes. Its training math is
also degenerate — ``relu(<u,v> / (|u|^2 |v|^2))`` (DMF.py:66-69, squared
norms, no clipping) divides by ~1e-16 at small-init, saturating every
logit, and the outer relu then blocks gradient to any positive pair whose
dot starts negative; trained this way every score collapses to exactly 0
(measured: the metric row became identical to an untrained constant-score
model).

Deliberate deviation, documented per repo convention: this implementation
follows the PAPER's formulation instead —

* tower inputs are the user's rating row / item's rating column (explicit
  values, not 0/1), as in the paper's Y matrix;
* output is true cosine ``<u,v> / max(|u| |v|, eps)`` clipped to
  [1e-6, 1), the paper's max(mu, y_hat);
* cross-entropy is the paper's binary CE on the clipped cosine (mean over
  instances, matching the scale of the other pointwise models here);
  ``loss_function=square`` keeps sum-of-squares semantics.

TPU-first: rows AND columns are gathered on device from padded
user-positives/item-positives with a parallel rating-value array (the
reference materializes dense num_items-length numpy vectors per instance
on the host — its biggest memory hazard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer


def _padded_values(matrix, padded) -> np.ndarray:
    """(N, L) float32 rating value for each padded id slot (0.0 on pad)."""
    vals = np.zeros(padded.items.shape, dtype=np.float32)
    indptr, indices, data = matrix.indptr, matrix.indices, matrix.data
    for u in range(matrix.shape[0]):
        lo, hi = indptr[u], indptr[u + 1]
        if hi > lo:
            order = np.argsort(indices[lo:hi])
            vals[u, : hi - lo] = data[lo:hi][order]
    return vals


@register("DMF")
class DMF(Recommender):
    data_kind = "pointwise"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        layers = list(config.get("layers", [200, 100]))
        self.first_layer_size = int(layers[0])
        self.last_layer_size = int(layers[-1])
        self.loss_function = config.get("loss_function", "cross_entropy")
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))

        train = dataset.train_matrix.tocsr()
        user_padded = build_padded_positives(train)
        item_csr = train.T.tocsr()
        item_padded = build_padded_positives(item_csr)
        self._user_rows = jnp.asarray(user_padded.items)   # (U, Lu) pad=I
        self._item_rows = jnp.asarray(item_padded.items)   # (I, Li) pad=U
        self._user_vals = jnp.asarray(_padded_values(train, user_padded))
        self._item_vals = jnp.asarray(_padded_values(item_csr, item_padded))
        if not self._dense_eval_fits():
            self.eval_dense_scores = None  # getattr -> absent

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        ks = jax.random.split(rng, 8)
        f, l = self.first_layer_size, self.last_layer_size
        return {
            "u_w1": init(ks[0], (self.num_items, f)),
            "u_b1": init(ks[1], (f,)),
            "u_w2": init(ks[2], (f, l)),
            "u_b2": init(ks[3], (l,)),
            "v_w1": init(ks[4], (self.num_users, f)),
            "v_b1": init(ks[5], (f,)),
            "v_w2": init(ks[6], (f, l)),
            "v_b2": init(ks[7], (l,)),
        }

    def _user_tower(self, params, users):
        """Rating row @ W1 as a padded weighted gather-sum, then dense."""
        rows = self._user_rows[users]                       # (B, Lu)
        vals = self._user_vals[users]                       # (B, Lu)
        w1_ext = jnp.concatenate(
            [params["u_w1"], jnp.zeros((1, self.first_layer_size))], axis=0
        )
        h1 = jax.nn.relu(
            jnp.sum(w1_ext[rows] * vals[:, :, None], axis=1) + params["u_b1"]
        )
        return h1 @ params["u_w2"] + params["u_b2"]

    def _item_tower(self, params, items):
        cols = self._item_rows[items]                       # (B, Li)
        vals = self._item_vals[items]                       # (B, Li)
        w1_ext = jnp.concatenate(
            [params["v_w1"], jnp.zeros((1, self.first_layer_size))], axis=0
        )
        h1 = jax.nn.relu(
            jnp.sum(w1_ext[cols] * vals[:, :, None], axis=1) + params["v_b1"]
        )
        return h1 @ params["v_w2"] + params["v_b2"]

    @staticmethod
    def _cosine(dot, u_sq, v_sq):
        """Clipped cosine: the paper's y_hat = max(mu, cos) with cos < 1."""
        cos = dot / jnp.maximum(jnp.sqrt(u_sq * v_sq), 1e-12)
        return jnp.clip(cos, 1e-6, 1.0 - 1e-7)

    def loss(self, params, batch, weights):
        u = self._user_tower(params, batch["users"])
        v = self._item_tower(params, batch["items"])
        dot = jnp.sum(u * v, axis=-1)
        y = self._cosine(
            dot,
            jnp.sum(jnp.square(u), axis=-1),
            jnp.sum(jnp.square(v), axis=-1),
        )
        labels = batch["labels"]
        if self.loss_function.lower() == "square":
            ce = jnp.square(labels - y)
            if weights is not None:
                ce = ce * weights
            return jnp.sum(ce)
        # paper eq. (12): normalized binary cross-entropy on the cosine
        ce = -(labels * jnp.log(y) + (1.0 - labels) * jnp.log1p(-y))
        if weights is not None:
            denom = jnp.maximum(jnp.sum(weights), 1.0)
            return jnp.sum(ce * weights) / denom
        return jnp.mean(ce)

    # all-users predict costs a (U, L_u, f) user-tower gather transient
    # plus the resident (U, I) matrix — a win over re-running the item
    # tower per eval batch only while those fit; above the budget the
    # hook un-advertises and the per-batch path stands (self-review r5:
    # the first version claimed the hoist "strictly dominates" comparing
    # only against the item-tower transient).
    _DENSE_EVAL_BUDGET = 512 * 1024 * 1024

    def _dense_eval_fits(self) -> bool:
        u_rows = int(self._user_rows.shape[1])
        trans = self.num_users * u_rows * self.first_layer_size
        resident = self.num_users * self.num_items
        return 4 * max(trans, resident) <= self._DENSE_EVAL_BUDGET

    def eval_dense_scores(self, params):
        """Evaluator/serving hoist hook (review r5): predict recomputes
        the FULL item tower — an (I, L_i, f) padded-gather transient —
        for every eval batch inside the scan, and the clipped cosine
        cannot factor into the eval_embeddings dot form. Budget-gated in
        __init__ (see _dense_eval_fits). Row-independent math keeps it
        bit-exact with batched predict."""
        return self.predict(
            params, jnp.arange(self.num_users, dtype=jnp.int32)
        )

    def predict(self, params, users):
        u = self._user_tower(params, users)                 # (B, l)
        v = self._item_tower(params, jnp.arange(self.num_items))  # (I, l)
        dot = u @ v.T
        u_sq = jnp.sum(jnp.square(u), axis=1)[:, None]
        v_sq = jnp.sum(jnp.square(v), axis=1)[None, :]
        return self._cosine(dot, u_sq, v_sq)
