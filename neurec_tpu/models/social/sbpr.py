"""SBPR — social Bayesian personalized ranking (Zhao et al., CIKM 2014).

Parity with model/social_recommender/SBPR.py:30-166:

* per-user social item set = items rated by trusted friends but not by the
  user (SBPR.py:46-55); users without social items are skipped;
* per positive: one social item sampled uniformly from the social set with
  weight suk = 1 + #friends who rated it; one negative excluded from
  positives AND social items;
* loss = bpr((y_pos - y_soc)/suk) + bpr(y_soc - y_neg) + reg * l2(lookups);
* eval scores = u @ item_table^T WITHOUT the bias — the reference's
  predict ignores the trained item bias (SBPR.py:152-160); mirrored.

On-device: social sets, per-item suk weights and the pos∪social exclusion
rows are precomputed as padded arrays; social/negative sampling runs inside
the jitted epoch (custom data kind).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.data.social import load_social_matrix
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss
from neurec_tpu.ops.sampling import sample_negatives


@register("SBPR")
class SBPR(Recommender):
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.reg_mf = float(config.get("reg_mf", 0.01))
        self.loss_function = config.get("loss_function", "bpr")
        self.epochs = int(config.get("num_epochs", config.get("epochs", 500)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))

        self.social_matrix = load_social_matrix(dataset, config)
        train_dict = dataset.get_user_train_dict()

        # per-user social item sets + suk weights
        social_items, social_suk = {}, {}
        for u, items in train_dict.items():
            friends = self.social_matrix[u].indices
            own = set(items)
            counts = {}
            for f in friends:
                for it in train_dict.get(f, ()):
                    if it not in own:
                        counts[it] = counts.get(it, 0) + 1
            if counts:
                social_items[u] = list(counts.keys())
                social_suk[u] = [counts[i] + 1 for i in social_items[u]]

        users_flat, pos_flat = [], []
        for u, items in train_dict.items():
            if u not in social_items:
                continue
            users_flat.extend([u] * len(items))
            pos_flat.extend(items)
        self._users_flat = jnp.asarray(np.asarray(users_flat, np.int32))
        self._pos_flat = jnp.asarray(np.asarray(pos_flat, np.int32))

        max_s = max((len(v) for v in social_items.values()), default=1)
        soc = np.zeros((self.num_users, max_s), dtype=np.int32)
        suk = np.ones((self.num_users, max_s), dtype=np.float32)
        soc_len = np.ones(self.num_users, dtype=np.int32)
        excl_len = build_padded_positives(dataset.train_matrix).items.shape[1] + max_s
        excl = np.full((self.num_users, excl_len), self.num_items, dtype=np.int32)
        for u, items in train_dict.items():
            combined = sorted(set(items) | set(social_items.get(u, ())))
            excl[u, : len(combined)] = combined
        for u, s_items in social_items.items():
            soc[u, : len(s_items)] = s_items
            suk[u, : len(s_items)] = social_suk[u]
            soc_len[u] = len(s_items)
        self._social_items = jnp.asarray(soc)
        self._social_suk = jnp.asarray(suk)
        self._social_len = jnp.asarray(soc_len)
        self._excl_rows = jnp.asarray(excl)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "user_emb": init(k1, (self.num_users, self.embedding_size)),
            "item_emb": init(k2, (self.num_items, self.embedding_size)),
            "bias": init(k3, (self.num_items,)),
        }

    def build_epoch(self, trainer):
        B = self.batch_size
        N = int(self._users_flat.shape[0])
        steps = -(-N // B)
        n_pad = steps * B
        tx = trainer.tx

        def score(params, users, items):
            q = params["item_emb"][items]
            b = params["bias"][items]
            y = jnp.sum(params["user_emb"][users] * q, axis=-1) + b
            return y, q, b

        def step(carry, xs):
            params, opt_state = carry
            idx, w, key = xs
            idx, w = trainer.dp_constrain(idx, w)
            k_soc, k_neg = jax.random.split(key)
            users = trainer.dp_constrain(self._users_flat[idx])
            pos = self._pos_flat[idx]
            s_idx = jax.random.randint(k_soc, (B,), 0, 2 ** 30) % (
                self._social_len[users]
            )
            soc = self._social_items[users, s_idx]
            suk = self._social_suk[users, s_idx]
            negs = sample_negatives(
                k_neg, self._excl_rows[users], self.num_items, ()
            )

            def loss_fn(p):
                y_pos, q1, b1 = score(p, users, pos)
                y_soc, q2, b2 = score(p, users, soc)
                y_neg, q3, b3 = score(p, users, negs)
                u = p["user_emb"][users]
                w2 = w[:, None]
                return (
                    pairwise_loss(
                        self.loss_function, (y_pos - y_soc) / suk, weights=w
                    )
                    + pairwise_loss(self.loss_function, y_soc - y_neg, weights=w)
                    + self.reg_mf
                    * l2_loss(
                        u * w2, q2 * w2, q1 * w2, q3 * w2,
                        b1 * w, b2 * w, b3 * w,
                    )
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            kp, kn = jax.random.split(key)
            perm = jax.random.permutation(kp, n_pad)
            idx = jnp.where(perm < N, perm, 0).astype(jnp.int32)
            w = (perm < N).astype(jnp.float32)
            keys = jax.random.split(kn, steps)
            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                (idx.reshape(steps, B), w.reshape(steps, B), keys),
            )
            return params, opt_state, jnp.sum(losses) / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("SBPR uses build_epoch (data_kind='custom')")

    def predict(self, params, users):
        return params["user_emb"][users] @ params["item_emb"].T

    def eval_embeddings(self, params, users):
        return params["user_emb"][users], params["item_emb"]
