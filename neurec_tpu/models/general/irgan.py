"""IRGAN — minimax IR GAN for item recommendation (Wang et al., SIGIR 2017).

Parity with model/general_recommender/IRGAN.py:15-250:

* generator G and discriminator D are both MF-with-bias scorers; G may be
  warm-started from a pickle (IRGAN.py:155-157), D starts random;
* D phase: per user, |pos| negatives sampled from softmax(G logits / d_tau)
  (temperature sampling); pointwise sigmoid CE on (pos,1)/(neg,0) pairs
  with SGD(lr) and d_reg on batch lookups (IRGAN.py:172-193, 204-212);
* G phase: per user, 2|pos| items sampled from the importance distribution
  pn = (1-0.2) softmax(G) + 0.2 uniform(pos); REINFORCE update with reward
  2(sigmoid(D)-0.5) * prob/pn and g_reg on lookups (IRGAN.py:215-235);
* evaluation uses the GENERATOR's embeddings (IRGAN.py:237-249).

TPU-first: both phases run as jitted scans — the D phase samples all
users' negatives in one categorical batch; the G phase mirrors the
reference's per-user sequential SGD updates as a scan over users.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.pretrain import try_load


@register("IRGAN")
class IRGAN(Recommender):
    data_kind = "custom"

    @staticmethod
    def _dp(*arrays):
        """Identity until build_epoch installs trainer.dp_constrain."""
        return arrays if len(arrays) != 1 else arrays[0]

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.factors_num = int(config.get("factors_num", 20))
        self.lr = float(config.get("lr", 0.001))
        self.g_reg = float(config.get("g_reg", 0.0))
        self.d_reg = float(config.get("d_reg", 0.1 / 16))
        self.g_epoch = int(config.get("g_epoch", 1))
        self.d_epoch = int(config.get("d_epoch", 1))
        self.d_tau = float(config.get("d_tau", 0.2))
        self.pretrain_file = config.get("pretrain_file", "")
        self.sample_lambda = 0.2

        padded = build_padded_positives(dataset.train_matrix)
        self._rows = jnp.asarray(padded.items)     # (U, L) pad = I
        self._lens = jnp.asarray(padded.lengths)
        self._train_users = jnp.asarray(
            np.where(padded.lengths > 0)[0].astype(np.int32)
        )
        self.L = padded.items.shape[1]

    def make_optimizer(self):
        return optax.identity()

    def init_opt_state(self, params):
        return {}

    def init_params(self, rng):
        def mf_init(key):
            k1, k2 = jax.random.split(key)
            return {
                "user_emb": jax.random.uniform(
                    k1, (self.num_users, self.factors_num), minval=-0.05, maxval=0.05
                ),
                "item_emb": jax.random.uniform(
                    k2, (self.num_items, self.factors_num), minval=-0.05, maxval=0.05
                ),
                "item_bias": jnp.zeros((self.num_items,)),
            }

        kg, kd = jax.random.split(rng)
        gen = mf_init(kg)
        loaded = try_load(self.pretrain_file)
        if loaded is not None:
            p = loaded[0]
            gen = {
                "user_emb": jnp.asarray(p[0]),
                "item_emb": jnp.asarray(p[1]),
                "item_bias": jnp.asarray(p[2]),
            }
        return {"gen": gen, "dis": mf_init(kd)}

    @staticmethod
    def _logits(mf, u):
        return mf["user_emb"][u] @ mf["item_emb"].T + mf["item_bias"]

    def _d_pass(self, params, key):
        """One discriminator sub-epoch; returns updated dis params + loss."""
        users = self._train_users
        nU = users.shape[0]
        L = self.L

        k_neg, k_perm = jax.random.split(key)
        # temperature-softmax negatives from G, |pos| per user (padded to L)
        g_logits = self._logits(params["gen"], users) / self.d_tau  # (nU, I)
        negs = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg, shape=(L,))
        )(jax.random.split(k_neg, nU), g_logits)

        pos_rows = self._rows[users]                          # (nU, L)
        slot_valid = (pos_rows < self.num_items).astype(jnp.float32)
        flat_users = jnp.repeat(users, 2 * L)
        flat_items = jnp.concatenate(
            [jnp.minimum(pos_rows, self.num_items - 1), negs], axis=1
        ).reshape(-1)
        flat_labels = jnp.concatenate(
            [jnp.ones((nU, L)), jnp.zeros((nU, L))], axis=1
        ).reshape(-1)
        flat_w = jnp.concatenate([slot_valid, slot_valid], axis=1).reshape(-1)

        N = flat_users.shape[0]
        B = self.batch_size
        steps = -(-N // B)
        n_pad = steps * B
        perm = jax.random.permutation(k_perm, n_pad)
        idx = jnp.where(perm < N, perm, 0)
        # tail slots alias flat instance 0 — their weight must be 0 or the
        # first user's first positive trains B-1 extra times per sub-epoch
        # (the repo-wide padded-tail contract; review r5)
        tail_w = (perm < N).astype(jnp.float32)

        def step(dis, xs):
            batch_idx, batch_tail_w = xs
            batch_idx = self._dp(batch_idx)
            u, i, lbl, w = self._dp(
                flat_users[batch_idx],
                flat_items[batch_idx],
                flat_labels[batch_idx],
                flat_w[batch_idx] * batch_tail_w,
            )

            def loss_fn(d):
                logits = (
                    jnp.sum(d["user_emb"][u] * d["item_emb"][i], axis=-1)
                    + d["item_bias"][i]
                )
                ce = (
                    jnp.maximum(logits, 0.0)
                    - logits * lbl
                    + jax.nn.softplus(-jnp.abs(logits))
                )
                # reference quirk mirrored (IRGAN.py:103-107): pre_loss is
                # an unreduced (B,) CE vector with the SCALAR lamda*l2
                # broadcast-added, and TF's minimize() differentiates its
                # SUM — the effective reg weight per batch is therefore
                # (number of real instances) * lamda, not lamda.
                reg = self.d_reg * jnp.sum(w) * 0.5 * (
                    jnp.sum(jnp.square(d["user_emb"][u] * w[:, None]))
                    + jnp.sum(jnp.square(d["item_emb"][i] * w[:, None]))
                    + jnp.sum(jnp.square(d["item_bias"][i] * w))
                )
                return jnp.sum(ce * w) + reg

            loss, grads = jax.value_and_grad(loss_fn)(dis)
            dis = jax.tree.map(lambda p, g: p - self.lr * g, dis, grads)
            return dis, loss

        dis, losses = jax.lax.scan(
            step, params["dis"],
            (idx.reshape(steps, B), tail_w.reshape(steps, B)),
        )
        return dict(params, dis=dis), jnp.mean(losses)

    def _g_pass(self, params, key):
        """One generator sub-epoch: per-user sequential REINFORCE updates."""
        users = self._train_users
        L = self.L
        S = 2 * L

        def step(gen, xs):
            u, k = xs
            pos_row = self._rows[u]
            n_pos = jnp.maximum(self._lens[u].astype(jnp.float32), 1.0)
            logits = gen["user_emb"][u] @ gen["item_emb"].T + gen["item_bias"]
            prob = jax.nn.softmax(logits)
            pn_ext = jnp.concatenate(
                [(1.0 - self.sample_lambda) * prob, jnp.zeros((1,))]
            )
            pn = pn_ext.at[pos_row].add(self.sample_lambda / n_pos)[
                : self.num_items
            ]
            sample = jax.random.categorical(k, jnp.log(pn + 1e-24), shape=(S,))
            n_samples = 2.0 * n_pos
            samp_w = (
                jnp.arange(S, dtype=jnp.float32) < n_samples
            ).astype(jnp.float32)

            d = params["dis"]
            d_logits = (
                jnp.sum(d["user_emb"][u] * d["item_emb"][sample], axis=-1)
                + d["item_bias"][sample]
            )
            reward = 2.0 * (jax.nn.sigmoid(d_logits) - 0.5)
            reward = reward * prob[sample] / jnp.maximum(pn[sample], 1e-24)
            reward = jax.lax.stop_gradient(reward)

            def loss_fn(g):
                lg = g["user_emb"][u] @ g["item_emb"].T + g["item_bias"]
                log_sm = jax.nn.log_softmax(lg)
                gan = -jnp.sum(log_sm[sample] * reward * samp_w) / jnp.maximum(
                    jnp.sum(samp_w), 1.0
                )
                reg = self.g_reg * 0.5 * (
                    jnp.sum(jnp.square(g["user_emb"][u]))
                    + jnp.sum(jnp.square(g["item_emb"][sample] * samp_w[:, None]))
                    + jnp.sum(jnp.square(g["item_bias"][sample] * samp_w))
                )
                return gan + reg

            loss, grads = jax.value_and_grad(loss_fn)(gen)
            gen = jax.tree.map(lambda p, gr: p - self.lr * gr, gen, grads)
            return gen, loss

        keys = jax.random.split(key, users.shape[0])
        gen, losses = jax.lax.scan(step, params["gen"], (users, keys))
        return dict(params, gen=gen), jnp.mean(losses)

    def build_epoch(self, trainer):
        self._dp = trainer.dp_constrain

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            loss = 0.0
            for r in range(self.d_epoch):
                params, loss = self._d_pass(
                    params, jax.random.fold_in(key, r)
                )
            for r in range(self.g_epoch):
                params, loss = self._g_pass(
                    params, jax.random.fold_in(key, 1000 + r)
                )
            return params, opt_state, loss

        return jax.jit(epoch, donate_argnums=(0,))

    def loss(self, params, batch, weights):
        raise RuntimeError("IRGAN uses build_epoch (data_kind='custom')")

    def predict(self, params, users):
        return self._logits(params["gen"], users)

    def eval_embeddings(self, params, users):
        gen = params["gen"]
        return self._affine_eval(
            gen["user_emb"][users], gen["item_emb"], gen["item_bias"]
        )
