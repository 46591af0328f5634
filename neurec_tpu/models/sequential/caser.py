"""Caser — convolutional sequence embedding (Tang & Wang, WSDM 2018).

Parity with model/sequential_recommender/Caser.py:40-209:

* sliding windows per user: L input items -> T target items; users with
  fewer than L+T items contribute one pre-padded window (Caser.py:144-173);
* vertical conv (nv filters over the L axis) + horizontal convs (nh
  filters of heights 1..L with max-pool over positions), concat ->
  dropout -> dense(relu) -> concat with user embedding (Caser.py:72-100);
* targets scored against a separate (num_items, 2d) prediction table +
  bias; mean BCE over T positives and neg_samples negatives
  (Caser.py:103-119); l2_reg on the four regularized tables;
* fresh negatives per epoch excluded from the user's items
  (Caser.py:174-190) — here sampled on device inside the jitted epoch;
* reference quirk mirrored: evaluation scores WITHOUT the learned item
  bias (Caser.py:122 ``all_logits = matmul(user_embs, item_embeddings^T)``
  — the bias only enters the training logits, Caser.py:104-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.sequences import pad_sequences
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.sampling import sample_negatives


@register("Caser")
class Caser(Recommender):
    needs_time = True
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.lr = float(config.get("lr", 0.001))
        self.l2_reg = float(config.get("l2_reg", 0.001))
        self.d = int(config.get("factors_num", 50))
        self.L = int(config.get("seq_L", 5))
        self.T = int(config.get("seq_T", 3))
        self.nv = int(config.get("nv", 4))
        self.nh = int(config.get("nh", 16))
        self.dropout = float(config.get("dropout", 0.5))
        self.neg_samples = int(config.get("neg_samples", 3))

        train_dict = dataset.get_user_train_dict(by_time=True)
        users_list, seq_list, pos_list = [], [], []
        self._user_test_seq = np.full(
            (self.num_users, self.L), self.num_items, dtype=np.int32
        )
        seq_len = self.L + self.T
        for user in sorted(train_dict.keys()):
            seq_items = train_dict[user]
            if len(seq_items) >= seq_len:
                first = True
                for i in range(len(seq_items), seq_len - 1, -1):
                    win = seq_items[i - seq_len : i]
                    if first:
                        self._user_test_seq[user] = win[-self.L :]
                        first = False
                    users_list.append(user)
                    seq_list.append(win[: self.L])
                    pos_list.append(win[-self.T :])
            else:
                win = pad_sequences(
                    [seq_items], value=self.num_items, max_len=seq_len,
                    padding="pre", truncating="pre",
                )[0]
                self._user_test_seq[user] = win[-self.L :]
                users_list.append(user)
                seq_list.append(win[: self.L])
                pos_list.append(win[-self.T :])
        self._users = jnp.asarray(np.asarray(users_list, dtype=np.int32))
        self._seqs = jnp.asarray(np.asarray(seq_list, dtype=np.int32))
        self._poss = jnp.asarray(np.asarray(pos_list, dtype=np.int32))
        self._user_test_seq = jnp.asarray(self._user_test_seq)

    def make_optimizer(self):
        return optax.adam(self.lr)

    def init_params(self, rng):
        xavier = jax.nn.initializers.glorot_uniform()
        ks = jax.random.split(rng, 8)
        d, L = self.d, self.L
        params = {
            "user_emb": xavier(ks[0], (self.num_users, d)),
            "seq_item_emb": xavier(ks[1], (self.num_items, d)),
            "conv_v_w": xavier(ks[2], (L, self.nv)),
            "conv_v_b": jnp.zeros((self.nv,)),
            "conv_h": [],
            "fc1_w": xavier(ks[3], (self.nv * d + self.nh * L, d)),
            "fc1_b": jnp.zeros((d,)),
            "item_emb": xavier(ks[4], (self.num_items, 2 * d)),
            "item_bias": jnp.zeros((self.num_items,)),
        }
        for i in range(1, L + 1):
            rng, k = jax.random.split(rng)
            params["conv_h"].append(
                {"w": xavier(k, (i, d, self.nh)), "b": jnp.zeros((self.nh,))}
            )
        return params

    def _user_vec(self, params, users, seqs, rng=None, training=False):
        """(B,) users + (B, L) item windows -> (B, 2d) representation."""
        table = jnp.concatenate(
            [params["seq_item_emb"], jnp.zeros((1, self.d))], axis=0
        )
        x = table[seqs]                                        # (B, L, d)
        # vertical conv: nv filters over the L axis per embedding column
        out_v = jnp.einsum("bld,lv->bdv", x, params["conv_v_w"]) + params["conv_v_b"]
        out_v = out_v.reshape(x.shape[0], self.nv * self.d)
        # horizontal convs: height-i filters over full embedding width
        out_hs = []
        for i, conv in enumerate(params["conv_h"], start=1):
            n_win = self.L - i + 1
            # windows (B, n_win, i, d) via static slicing
            wins = jnp.stack([x[:, p : p + i, :] for p in range(n_win)], axis=1)
            conv_out = jax.nn.relu(
                jnp.einsum("bpid,idf->bpf", wins, conv["w"]) + conv["b"]
            )
            out_hs.append(jnp.max(conv_out, axis=1))           # (B, nh)
        out = jnp.concatenate([out_v] + out_hs, axis=1)
        if training and rng is not None and self.dropout > 0:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
        z = jax.nn.relu(out @ params["fc1_w"] + params["fc1_b"])  # (B, d)
        return jnp.concatenate([z, params["user_emb"][users]], axis=1)

    def caser_loss(self, params, users, seqs, pos, neg, w, rng):
        uvec = self._user_vec(params, users, seqs, rng=rng, training=True)
        tar = jnp.concatenate([pos, neg], axis=1)              # (B, T+S)
        tar_emb = params["item_emb"][tar]                      # (B, T+S, 2d)
        tar_bias = params["item_bias"][tar]
        logits = jnp.einsum("bd,btd->bt", uvec, tar_emb) + tar_bias
        pos_logits = logits[:, : self.T]
        neg_logits = logits[:, self.T :]
        w2 = w[:, None]
        denom_p = jnp.maximum(jnp.sum(w) * self.T, 1.0)
        denom_n = jnp.maximum(jnp.sum(w) * self.neg_samples, 1.0)
        pos_loss = jnp.sum(-jnp.log(jax.nn.sigmoid(pos_logits) + 1e-24) * w2) / denom_p
        neg_loss = jnp.sum(
            -jnp.log(1.0 - jax.nn.sigmoid(neg_logits) + 1e-24) * w2
        ) / denom_n
        reg = self.l2_reg * 0.5 * (
            jnp.sum(jnp.square(params["user_emb"]))
            + jnp.sum(jnp.square(params["seq_item_emb"]))
            + jnp.sum(jnp.square(params["item_emb"]))
            + jnp.sum(jnp.square(params["item_bias"]))
        )
        return pos_loss + neg_loss + reg

    def build_epoch(self, trainer):
        B = self.batch_size
        N = int(self._users.shape[0])
        steps = -(-N // B)
        n_pad = steps * B
        padded_items = trainer._padded_items
        tx = trainer.tx

        def step(carry, xs):
            params, opt_state = carry
            idx, w, key = xs
            idx, w = trainer.dp_constrain(idx, w)
            k_neg, k_drop = jax.random.split(key)
            users = trainer.dp_constrain(self._users[idx])
            seqs = self._seqs[idx]
            pos = self._poss[idx]
            rows = padded_items[users]
            negs = trainer.dp_constrain(
                sample_negatives(
                    k_neg, rows, self.num_items, (self.neg_samples,)
                )
            )

            loss, grads = jax.value_and_grad(
                lambda p: self.caser_loss(p, users, seqs, pos, negs, w, k_drop)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            kp, kn = jax.random.split(key)
            perm = jax.random.permutation(kp, n_pad)
            idx = jnp.where(perm < N, perm, 0).astype(jnp.int32)
            w = (perm < N).astype(jnp.float32)
            step_keys = jax.random.split(kn, steps)
            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                (idx.reshape(steps, B), w.reshape(steps, B), step_keys),
            )
            return params, opt_state, jnp.sum(losses) / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("Caser uses build_epoch (data_kind='custom')")

    def predict(self, params, users):
        seqs = self._user_test_seq[users]
        uvec = self._user_vec(params, users, seqs, training=False)
        # no item bias at eval — reference quirk, see module docstring
        return uvec @ params["item_emb"].T

    def eval_embeddings(self, params, users):
        seqs = self._user_test_seq[users]
        uvec = self._user_vec(params, users, seqs, training=False)
        return self._affine_eval(uvec, params["item_emb"])
