"""SRGNN — session graphs + gated GNN (Wu et al., AAAI 2019).

Parity with model/sequential_recommender/SRGNN.py:20-236:

* training instances: every suffix target of each user's sequence with a
  ``max_seq_len`` context window (SRGNN.py:34-39);
* per-session graph over the session's UNIQUE items with in/out
  degree-normalized adjacency (SRGNN.py:180-211);
* ``step`` GGNN iterations: GRU cell whose input is
  [A_in (h W_in + b_in); A_out (h W_out + b_out)] (SRGNN.py:76-100);
* attention readout (sigmoid MLP against the last item) + optional hybrid
  concat with the last hidden, projected by B (SRGNN.py:102-124);
* softmax CE over the full catalog; L2 over all trainable params (the
  reference's name-filter never matches, so everything is regularized);
* Adam with staircase exponential lr decay
  (decay_steps = lr_dc_step * N / batch_size, SRGNN.py:138-143).

TPU-first: the session graph (unique nodes via sort + compare-adjacent,
alias mapping via cumsum ranks, adjacency via scatter) is built INSIDE the
jitted step with static shapes — the reference rebuilds numpy graphs on the
host for every batch, every epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.sequences import pad_sequences
from neurec_tpu.models.base import Recommender, register


def _session_graph(seq, sess_len, num_items):
    """seq (L,) post-padded with num_items -> (nodes, alias, A_in, A_out).

    Mirrors SRGNN.py:180-211 with the pad item occupying a node, exactly
    like the reference's np.unique over the padded sequence.
    """
    L = seq.shape[0]
    order = jnp.argsort(seq)
    sorted_items = seq[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_items[1:] != sorted_items[:-1]]
    )
    rank = jnp.cumsum(is_new) - 1                    # node id per sorted slot
    inv = jnp.argsort(order)
    alias = rank[inv]                                # (L,) node id per position
    nodes = jnp.full((L,), num_items, seq.dtype).at[rank].set(sorted_items)

    # edges alias[t] -> alias[t+1] for t < sess_len - 1
    valid = jnp.arange(L - 1) < (sess_len - 1)
    src = jnp.where(valid, alias[:-1], L)            # row L is a dump slot
    dst = jnp.where(valid, alias[1:], L)
    adj = jnp.zeros((L + 1, L + 1)).at[src, dst].max(
        valid.astype(jnp.float32)
    )[:L, :L]
    in_deg = jnp.maximum(jnp.sum(adj, axis=0), 1.0)   # (L,) column sums
    out_deg = jnp.maximum(jnp.sum(adj, axis=1), 1.0)  # (L,) row sums
    a_in = adj / in_deg[None, :]
    a_out = adj.T / out_deg[None, :]
    return nodes, alias, a_in, a_out


def _gru_cell(params, x, h):
    """tf GRUCell semantics (gate bias 1.0, tanh candidate)."""
    gates = jax.nn.sigmoid(
        jnp.concatenate([x, h], axis=-1) @ params["w_gate"] + params["b_gate"]
    )
    r, u = jnp.split(gates, 2, axis=-1)
    c = jnp.tanh(
        jnp.concatenate([x, r * h], axis=-1) @ params["w_cand"] + params["b_cand"]
    )
    return u * h + (1.0 - u) * c


@register("SRGNN")
class SRGNN(Recommender):
    needs_time = True
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.lr = float(config.get("lr", 0.001))
        self.L2 = float(config.get("L2", 1e-5))
        self.hidden_size = int(config.get("hidden_size", 64))
        self.step = int(config.get("step", 1))
        self.lr_dc = float(config.get("lr_dc", 0.1))
        self.lr_dc_step = float(config.get("lr_dc_step", 3))
        self.nonhybrid = bool(config.get("nonhybrid", False))
        self.max_seq_len = int(config.get("max_seq_len", 200))

        self.user_pos_train = dataset.get_user_train_dict(by_time=True)
        train_seq, train_tar = [], []
        for user, seqs in self.user_pos_train.items():
            for i in range(1, len(seqs)):
                train_seq.append(seqs[max(0, len(seqs) - i - self.max_seq_len):
                                      len(seqs) - i])
                train_tar.append(seqs[-i])
        self._max_len = min(
            self.max_seq_len, max((len(s) for s in train_seq), default=1)
        )
        self._seq = jnp.asarray(pad_sequences(
            train_seq, value=self.num_items, max_len=self._max_len,
            padding="post", truncating="pre",
        ))
        self._seq_len = jnp.asarray(
            np.asarray([min(len(s), self._max_len) for s in train_seq], np.int32)
        )
        self._tar = jnp.asarray(np.asarray(train_tar, dtype=np.int32))
        self._n_inst = len(train_tar)

        # eval: last max_seq_len items per user
        eval_seqs = [
            self.user_pos_train.get(u, [self.num_items])[-self._max_len:]
            for u in range(self.num_users)
        ]
        self._eval_seq = jnp.asarray(pad_sequences(
            eval_seqs, value=self.num_items, max_len=self._max_len, padding="post"
        ))
        self._eval_len = jnp.asarray(
            np.asarray([min(len(s), self._max_len) for s in eval_seqs], np.int32)
        )

    def make_optimizer(self):
        decay = self.lr_dc_step * self._n_inst / self.batch_size
        schedule = optax.exponential_decay(
            init_value=self.lr,
            transition_steps=max(int(decay), 1),
            decay_rate=self.lr_dc,
            staircase=True,
        )
        return optax.adam(schedule)

    def init_params(self, rng):
        d = self.hidden_size
        stdv = 1.0 / np.sqrt(d)

        def uni(key, shape):
            return jax.random.uniform(key, shape, minval=-stdv, maxval=stdv)

        ks = jax.random.split(rng, 12)
        return {
            "embedding": uni(ks[0], (self.num_items, d)),
            "nasr_w1": uni(ks[1], (d, d)),
            "nasr_w2": uni(ks[2], (d, d)),
            "nasr_v": uni(ks[3], (1, d)),
            "nasr_b": jnp.zeros((d,)),
            "W_in": uni(ks[4], (d, d)),
            "b_in": uni(ks[5], (d,)),
            "W_out": uni(ks[6], (d, d)),
            "b_out": uni(ks[7], (d,)),
            "B": uni(ks[8], (2 * d, d)),
            "gru": {
                "w_gate": uni(ks[9], (3 * d, 2 * d)),
                "b_gate": jnp.ones((2 * d,)),
                "w_cand": uni(ks[10], (3 * d, d)),
                "b_cand": jnp.zeros((d,)),
            },
        }

    def _forward(self, params, seq, sess_len):
        """(B, L) padded sessions -> (B, num_items) logits."""
        B, L = seq.shape
        d = self.hidden_size
        nodes, alias, a_in, a_out = jax.vmap(
            lambda s, n: _session_graph(s, n, self.num_items)
        )(seq, sess_len)

        table = jnp.concatenate([params["embedding"], jnp.zeros((1, d))], axis=0)
        h = table[nodes]                                  # (B, L, d)
        for _ in range(self.step):
            av_in = jnp.einsum("bij,bjd->bid", a_in, h @ params["W_in"] + params["b_in"])
            av_out = jnp.einsum(
                "bij,bjd->bid", a_out, h @ params["W_out"] + params["b_out"]
            )
            av = jnp.concatenate([av_in, av_out], axis=-1)  # (B, L, 2d)
            h = _gru_cell(params["gru"], av.reshape(-1, 2 * d), h.reshape(-1, d))
            h = h.reshape(B, L, d)

        mask = (
            jnp.arange(L)[None, :] < sess_len[:, None]
        ).astype(jnp.float32)                             # (B, L)
        last_alias = jnp.take_along_axis(
            alias, jnp.maximum(sess_len - 1, 0)[:, None], axis=1
        )[:, 0]
        last_h = jnp.take_along_axis(h, last_alias[:, None, None].repeat(d, -1), 1)[
            :, 0
        ]                                                 # (B, d)
        seq_h = jnp.take_along_axis(h, alias[:, :, None].repeat(d, -1), 1)  # (B,L,d)

        last = (last_h @ params["nasr_w1"])[:, None, :]
        sq = seq_h @ params["nasr_w2"]
        m = jax.nn.sigmoid(last + sq + params["nasr_b"])
        coef = (m @ params["nasr_v"].T)[:, :, 0] * mask   # (B, L)
        attended = jnp.sum(coef[:, :, None] * seq_h, axis=1)
        if self.nonhybrid:
            sess_emb = attended
        else:
            sess_emb = jnp.concatenate([attended, last_h], axis=-1) @ params["B"]
        return sess_emb @ params["embedding"].T

    def build_epoch(self, trainer):
        N = self._n_inst
        # reference drops the last partial batch; when the whole dataset is
        # smaller than one batch that would train nothing (and the old
        # steps=1 path crashed reshaping N elements into (1, B)) — clamp
        # the batch to N so tiny datasets still train one full batch
        B = max(min(self.batch_size, N), 1)
        steps = max(N // B, 1)
        tx = trainer.tx

        def step(carry, xs):
            params, opt_state = carry
            idx, = xs
            idx = trainer.dp_constrain(idx)
            seq = trainer.dp_constrain(self._seq[idx])
            sess_len = self._seq_len[idx]
            tar = self._tar[idx]

            def loss_fn(p):
                logits = self._forward(p, seq, sess_len)
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, tar)
                l2 = sum(
                    0.5 * jnp.sum(jnp.square(x))
                    for x in jax.tree.leaves(p)
                )
                return jnp.mean(ce) + self.L2 * l2

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            perm = jax.random.permutation(key, N)[: steps * B]
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (perm.reshape(steps, B),)
            )
            return params, opt_state, jnp.mean(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("SRGNN uses build_epoch (data_kind='custom')")

    def predict(self, params, users):
        seq = self._eval_seq[users]
        sess_len = self._eval_len[users]
        return self._forward(params, seq, sess_len)
