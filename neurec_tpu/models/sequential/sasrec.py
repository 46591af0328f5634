"""SASRec — self-attentive sequential recommendation (Kang & McAuley, ICDM 2018).

Parity with model/sequential_recommender/SASRec.py:268-443:

* item embeddings with a zero pad row at index num_items, scaled by sqrt(d),
  + learned position embeddings (SASRec.py:291-309);
* num_blocks x [pre-LN causal MHA (residual adds the normalized input) ->
  pre-LN conv1d FFN], padding positions re-zeroed per block, final LN
  (SASRec.py:313-357, helpers :132-266);
* training: per-user (seq=items[:-1], pos=items[1:]) pre-padded/truncated
  to max_len; one fresh negative per position excluded from the user's
  items; per-position binary CE averaged over real targets; Adam with
  beta2=0.98 (SASRec.py:359-383, :407-425);
* eval: last-position embedding vs all item embeddings (SASRec.py:386-387).

TPU-first: the whole epoch (shuffle + per-position negative sampling +
transformer fwd/bwd + Adam) is one jitted lax.scan; the reference runs
Cython sampling + padding on the host every epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.sequences import pad_sequences
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.attention import (
    dense,
    feedforward,
    init_dense,
    init_layer_norm,
    layer_norm,
    multihead_attention,
)
from neurec_tpu.ops.sampling import sample_negatives


@register("SASRec")
class SASRec(Recommender):
    needs_time = True
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.lr = float(config.get("lr", 0.001))
        self.l2_emb = float(config.get("l2_emb", 0.0))
        self.hidden_units = int(config.get("hidden_units", 50))
        self.dropout_rate = float(config.get("dropout_rate", 0.5))
        self.max_len = int(config.get("max_len", 50))
        self.num_blocks = int(config.get("num_blocks", 2))
        self.num_heads = int(config.get("num_heads", 1))

        user_pos_train = dataset.get_user_train_dict(by_time=True)
        self._train_users = np.asarray(
            [u for u, seq in user_pos_train.items() if len(seq) >= 2],
            dtype=np.int32,
        )
        seqs = [user_pos_train[u][:-1] for u in self._train_users]
        poss = [user_pos_train[u][1:] for u in self._train_users]
        pad = self.num_items
        self._seq = jnp.asarray(pad_sequences(
            seqs, value=pad, max_len=self.max_len, padding="pre", truncating="pre"
        ))
        self._pos = jnp.asarray(pad_sequences(
            poss, value=pad, max_len=self.max_len, padding="pre", truncating="pre"
        ))
        # eval: full history per user, pre-padded to max_len
        eval_seqs = [user_pos_train.get(u, [pad]) for u in range(self.num_users)]
        self._eval_seq = jnp.asarray(pad_sequences(
            eval_seqs, value=pad, max_len=self.max_len, padding="pre",
            truncating="pre",
        ))

    def make_optimizer(self):
        return optax.adam(self.lr, b2=0.98)

    def init_params(self, rng):
        d = self.hidden_units
        xavier = jax.nn.initializers.glorot_uniform()
        rng, ke, kp = jax.random.split(rng, 3)
        params = {
            "item_emb": xavier(ke, (self.num_items, d)),
            "pos_emb": xavier(kp, (self.max_len, d)),
            "blocks": [],
            "final_ln": init_layer_norm(d),
        }
        for _ in range(self.num_blocks):
            rng, kq, kk, kv, k1, k2 = jax.random.split(rng, 6)
            params["blocks"].append(
                {
                    "ln1": init_layer_norm(d),
                    "att": {
                        "q": init_dense(kq, d, d),
                        "k": init_dense(kk, d, d),
                        "v": init_dense(kv, d, d),
                    },
                    "ln2": init_layer_norm(d),
                    "ffn": {"w1": init_dense(k1, d, d), "w2": init_dense(k2, d, d)},
                }
            )
        return params

    def _table(self, params):
        """Item table with the zero pad row, scaled by sqrt(d)."""
        d = self.hidden_units
        table = jnp.concatenate(
            [params["item_emb"], jnp.zeros((1, d))], axis=0
        )
        return table * (d ** 0.5)

    def encode(self, params, seq_ids, rng=None, training=False):
        """(B, T) item ids -> (B, T, d) final hidden states."""
        B, T = seq_ids.shape
        table = self._table(params)
        x = table[seq_ids] + params["pos_emb"][None, :T, :]
        r = rng
        if training and r is not None:
            r, rd = jax.random.split(r)
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(rd, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        valid = (seq_ids != self.num_items).astype(jnp.float32)
        x = x * valid[:, :, None]
        for blk in params["blocks"]:
            if r is not None:
                r, r1, r2 = jax.random.split(r, 3)
            else:
                r1 = r2 = None
            q = layer_norm(blk["ln1"], x)
            x = multihead_attention(
                blk["att"], q, x, valid, self.num_heads, causal=True,
                dropout_rate=self.dropout_rate, rng=r1, training=training,
            )
            h = layer_norm(blk["ln2"], x)
            x = feedforward(
                blk["ffn"], h, dropout_rate=self.dropout_rate, rng=r2,
                training=training,
            )
            x = x * valid[:, :, None]
        return layer_norm(params["final_ln"], x)

    def seq_loss(self, params, seq, pos, neg, seq_weights, rng):
        """Per-position BCE averaged over real targets (SASRec.py:369-375)."""
        h = self.encode(params, seq, rng=rng, training=True)    # (B,T,d)
        table = self._table(params)
        pos_emb = table[pos]
        neg_emb = table[neg]
        pos_logits = jnp.sum(h * pos_emb, axis=-1)
        neg_logits = jnp.sum(h * neg_emb, axis=-1)
        is_target = (pos != self.num_items).astype(jnp.float32) * (
            seq_weights[:, None]
        )
        pos_loss = -jnp.log(jax.nn.sigmoid(pos_logits) + 1e-24) * is_target
        neg_loss = -jnp.log(1.0 - jax.nn.sigmoid(neg_logits) + 1e-24) * is_target
        loss = jnp.sum(pos_loss + neg_loss) / jnp.maximum(jnp.sum(is_target), 1.0)
        if self.l2_emb > 0:
            loss = loss + self.l2_emb * 0.5 * (
                jnp.sum(jnp.square(params["item_emb"]))
                + jnp.sum(jnp.square(params["pos_emb"]))
            )
        return loss

    def build_epoch(self, trainer):
        B = self.batch_size
        N = int(self._train_users.shape[0])
        steps = -(-N // B)
        n_pad = steps * B
        users_all = jnp.asarray(self._train_users)
        seq_all, pos_all = self._seq, self._pos
        padded_items = trainer._padded_items
        num_items = self.num_items
        tx = trainer.tx

        def step(carry, xs):
            params, opt_state = carry
            idx, w, key = xs
            idx, w = trainer.dp_constrain(idx, w)
            k_neg, k_drop = jax.random.split(key)
            users = users_all[idx]
            seq, pos = trainer.dp_constrain(seq_all[idx], pos_all[idx])
            rows = padded_items[users]
            negs = trainer.dp_constrain(
                sample_negatives(k_neg, rows, num_items, (self.max_len,))
            )

            def loss_fn(p):
                return self.seq_loss(p, seq, pos, negs, w, k_drop)

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
            step_keys = jax.random.split(kn, steps)
            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                (idx.reshape(steps, B), w.reshape(steps, B), step_keys),
            )
            return params, opt_state, jnp.sum(losses) / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("SASRec uses build_epoch (data_kind='custom')")

    def predict(self, params, users):
        seq = self._eval_seq[users]
        h = self.encode(params, seq, training=False)
        last = h[:, -1, :]
        return last @ self._table(params)[: self.num_items].T

    def eval_embeddings(self, params, users):
        seq = self._eval_seq[users]
        h = self.encode(params, seq, training=False)
        return h[:, -1, :], self._table(params)[: self.num_items]
