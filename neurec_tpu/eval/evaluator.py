"""Fully on-device top-K ranking evaluation.

Replaces the reference's evaluation stack — ProxyEvaluator /
GroupedEvaluator / UniEvaluator with a C++ thread-pool backend
(evaluator/proxy_evaluator.py, evaluator/grouped_evaluator.py,
evaluator/backend/cpp/*) — with a single jitted device pipeline:

    scores = predict(params, users)            # batched, (B, num_items)
    mask train items to -inf                   # fused bit-plane bitmap
    top-K = lax.top_k                          # on device
    metrics = vectorized cumulative kernels    # ops/metrics.py

so evaluation never round-trips score matrices to the host (the reference
moves a (B, num_items) float matrix across the device boundary per batch and
partial-sorts it on CPU threads, evaluate.h:23-50).

Masking tiers (all bit-exact vs each other, chosen in _make_eval_step):
the DEFAULT packs each eval user's static train mask once into a global
bit-plane bitmap whose expand+where fuses into the score producer's
epilogue (1.33x production eval at gowalla scale,
benchmarks/eval_bits_prod_ab.json); NEUREC_EVAL_PREMASK=0 restores the
legacy tiers — the Pallas fused score+mask kernel (shard_mapped over
'data' on a mesh) for factorized models on TPU, and the XLA scatter
chain otherwise. Catalogs >= 100k items on a 2-D mesh switch to the
item-sharded local-top-K merge instead.

Protocol parity:

* metrics configurable from {Precision, Recall, MAP, NDCG, MRR}; auto-fits
  leave-one-out and fold-out splits (uni_evaluator.py:17-31);
* full-catalog protocol with train-item masking (uni_evaluator.py:133-143);
* sampled-candidates protocol when per-user test negatives exist: candidates
  are test positives followed by fixed negatives and ground-truth indices are
  the first len(pos) positions (uni_evaluator.py:123-131);
* grouped evaluation over train-interaction-count buckets with the
  reference's ``(lo,hi]:`` row labels (grouped_evaluator.py:63-77,107-112);
* result strings: metric-major, ``("%.8f" % x).ljust(12)`` tab-joined
  (uni_evaluator.py:150-157).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.ops.metrics import METRIC_INDEX, METRIC_NAMES, all_metrics, hit_matrix

import logging as _pylogging

_log = _pylogging.getLogger("neurec_tpu.eval")

PredictFn = Callable[[object, jnp.ndarray], jnp.ndarray]

# catalog size at which eval auto-switches from the replicated-item-table
# kernel (one shard_map over 'data') to the item-sharded merge-top-k path
# (table P('model'), local top-K + all-gather merge) — see
# UniEvaluator._item_shard_mode for the measured rationale
_ITEM_SHARD_THRESHOLD = 100_000


def _pallas_interpret_forced() -> bool:
    """Tests set NEUREC_PALLAS_INTERPRET=1 to exercise the Pallas eval path
    (incl. its shard_map partitioning) on the CPU mesh in interpreter mode."""
    import os

    return os.environ.get("NEUREC_PALLAS_INTERPRET", "") == "1"


def _pad_rows(rows: List[List[int]], pad_value: int, min_len: int = 1):
    max_len = max(max((len(r) for r in rows), default=0), min_len)
    out = np.full((len(rows), max_len), pad_value, dtype=np.int32)
    lengths = np.zeros(len(rows), dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        lengths[i] = len(r)
    return out, lengths


class UniEvaluator:
    """On-device evaluator for a flat (ungrouped) set of test users."""

    def __init__(
        self,
        user_train_dict: Dict[int, List[int]],
        user_test_dict: Dict[int, List[int]],
        user_neg_test: Optional[Dict[int, List[int]]] = None,
        metric: Optional[Sequence[str]] = None,
        top_k=50,
        batch_size: int = 1024,
        num_items: Optional[int] = None,
        num_thread: int = 8,  # thread count for the native host backend
        mesh=None,
        backend: str = "device",
        item_shard: str = "auto",
    ):
        self.mesh = mesh
        # accept the env var's 1/0 spellings too (a properties file value
        # like eval_item_shard=1 coerces to int 1 -> str '1' upstream)
        item_shard = {
            "1": "on", "true": "on", "0": "off", "false": "off",
        }.get(str(item_shard).lower(), str(item_shard).lower())
        if item_shard not in ("auto", "on", "off"):
            raise ValueError(
                "eval_item_shard must be 'auto', 'on', 'off', 1 or 0, got %r"
                % (item_shard,)
            )
        self._item_shard_flag = item_shard
        self.num_thread = int(num_thread)
        # runtime backend selection, parity with the reference's cpp->python
        # import fallback (evaluator/backend/__init__.py:1-6): 'device' is
        # the jitted on-accelerator pipeline; 'native' ranks score matrices
        # on the C++ thread-pool host tier (neurec_tpu/native/) — useful on
        # device-less installs and as a production cross-check.
        if backend not in ("device", "native"):
            raise ValueError("eval_backend must be 'device' or 'native', got %r"
                             % (backend,))
        if backend == "native":
            try:
                from neurec_tpu import native

                native.build()
                print("NeuRec-TPU eval backend: native (C++ host thread pool)")
            except Exception as e:  # g++ missing, build failure, ...
                print("native eval backend unavailable (%s); "
                      "falling back to device" % e)
                backend = "device"
        self.backend = backend
        if metric is None:
            metric = list(METRIC_NAMES)
        elif isinstance(metric, str):
            metric = [metric]
        for m in metric:
            if m not in METRIC_INDEX:
                raise ValueError("There is no metric named '%s'!" % m)
        self.metrics = list(metric)
        self.metrics_num = len(self.metrics)
        self._metric_rows = np.asarray([METRIC_INDEX[m] for m in self.metrics])

        self.user_pos_train = user_train_dict
        self.user_pos_test = user_test_dict
        self.user_neg_test = user_neg_test
        self.batch_size = int(batch_size)

        self.max_top = top_k if isinstance(top_k, int) else max(top_k)
        if isinstance(top_k, int):
            self.top_show = np.arange(top_k) + 1
        else:
            self.top_show = np.sort(top_k)

        if num_items is None:
            num_items = 0
            for d in (user_train_dict, user_test_dict, user_neg_test or {}):
                for items in d.values():
                    if len(items):
                        num_items = max(num_items, max(items) + 1)
        self.num_items = int(num_items)

        # global padded sorted train rows, for masking (pad == num_items)
        num_users = max(
            [u for u in user_train_dict] + [u for u in user_test_dict], default=-1
        ) + 1
        max_train = max(
            (len(v) for v in user_train_dict.values()), default=0
        )
        train_rows = np.full(
            (num_users, max(max_train, 1)), self.num_items, dtype=np.int32
        )
        for u, items in user_train_dict.items():
            train_rows[u, : len(items)] = np.sort(items)
        self._train_rows_np = train_rows
        self._train_rows = jnp.asarray(train_rows)

        # test-user-aligned padded truth rows
        self.test_users = np.asarray(list(user_test_dict.keys()), dtype=np.int32)
        test_rows, test_lens = _pad_rows(
            [list(user_test_dict[u]) for u in self.test_users], self.num_items
        )
        self._test_rows = jnp.asarray(test_rows)
        self._test_lens = jnp.asarray(test_lens)

        if user_neg_test is not None:
            cands = [
                list(user_test_dict[u]) + list(user_neg_test[u])
                for u in self.test_users
            ]
            cand_rows, _ = _pad_rows(cands, self.num_items, min_len=self.max_top)
            self._cand_rows = jnp.asarray(cand_rows)
            self._n_pos = jnp.asarray(
                [len(user_test_dict[u]) for u in self.test_users], dtype=np.int32
            )
        else:
            self._cand_rows = None
            self._n_pos = None

        self._user_pos_index = {int(u): i for i, u in enumerate(self.test_users)}
        self._jit_cache: Dict[int, Callable] = {}
        self._default_batches = None  # cached full-test-set eval batches
        self._bits_table = None  # cached packed train-mask bitmap

    # -- info --------------------------------------------------------------
    def metrics_info(self) -> str:
        metrics_show = [
            "\t".join(
                ("%s@" % m + str(k)).ljust(12) for k in self.top_show
            )
            for m in self.metrics
        ]
        return "metrics:\t%s" % "\t".join(metrics_show)

    # -- jitted eval --------------------------------------------------------
    def _item_shard_mode(self) -> str:
        """'on' / 'off' / 'auto' for the item-sharded eval kernel.

        auto engages at >= ``_ITEM_SHARD_THRESHOLD`` items: below it, one
        replicated-table kernel per device is faster than paying two
        all-gathers per batch (measured: the 38.5k-item gowalla catalog
        evaluates 14.8k users in 0.17 s replicated — table + per-batch
        scores are MBs); above it the table (I*d floats) and the (B, I)
        score block stop fitting comfortably per device and compute should
        scale with the 'model' axis too. Override: NEUREC_EVAL_ITEM_SHARD.
        """
        import os

        env = os.environ.get("NEUREC_EVAL_ITEM_SHARD", "").lower()
        if env in ("1", "on"):
            return "on"
        if env in ("0", "off"):
            return "off"
        return self._item_shard_flag

    @property
    def _items_pad8(self) -> int:
        """Padded catalog size for bit-plane packing.

        Rounded to a multiple of 1024 so the packed table's minor dim
        (I_p/8) is a 128-lane multiple — with an unaligned minor dim the
        plane-expand reshape stops fusing into the matmul epilogue and
        the measured gain disappears (TPU pads the minor dim to 128
        physically either way, so the extra columns are free).
        """
        return self.num_items + ((-self.num_items) % 1024)

    def _premask_enabled(self) -> bool:
        """Pre-packed train-mask bitmap + XLA-fused bit-plane masking.

        DEFAULT for every model while the packed table fits a
        memory budget: with global bit-plane packing the mask expansion
        ``((bits >> plane) & 1).reshape(B, I)`` plus the ``where`` fuse
        into the score matmul's epilogue, so the per-call (B, I) int8
        scatter build disappears and the mask read shrinks 8x. Measured
        1.74x on score+mask and 1.32x on score+mask+topk at gowalla
        scale, bit-exact (benchmarks/eval_attrib3.json). The pure-XLA
        formulation is also GSPMD-partitionable — no shard_map needed on
        a mesh. NEUREC_EVAL_PREMASK=0 forces the legacy scatter/Pallas
        paths.
        """
        import os

        flag = os.environ.get("NEUREC_EVAL_PREMASK", "auto")
        if flag in ("0", "off"):
            return False
        bytes_needed = len(self.test_users) * (self._items_pad8 // 8)
        return bytes_needed <= 512 * 1024 * 1024

    def _get_bits_table(self):
        """(n_test, I_p8/8) uint8 global-bit-plane train masks,
        position-aligned; built on device once per evaluator and cached.

        Plane layout: item ``c*(I_p8/8) + j`` lives in byte ``j`` bit
        ``c`` (pack_train_bits with block_items = I_p8), so expansion is
        a broadcast+shift+reshape XLA fuses into the consumer.
        """
        if self._bits_table is None:
            from neurec_tpu.ops.pallas_kernels import pack_train_bits

            i_p8 = self._items_pad8
            chunk = 4096
            n = len(self.test_users)
            pack = jax.jit(
                lambda rows: pack_train_bits(
                    rows, self.num_items, block_items=i_p8
                )
            )
            parts = []
            for lo in range(0, n, chunk):
                sel = jnp.asarray(
                    self.test_users[lo : min(lo + chunk, n)].astype(np.int32)
                )
                rows = self._train_rows[sel]
                if rows.shape[0] < chunk and lo > 0:
                    rows = jnp.pad(
                        rows,
                        ((0, chunk - rows.shape[0]), (0, 0)),
                        constant_values=self.num_items,
                    )
                parts.append(pack(rows)[: min(chunk, n - lo)])
            self._bits_table = (
                jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
        return self._bits_table

    def _make_item_sharded_topk(self, K: int, interpret: bool):
        """Top-K over an item table sharded P('model') on the 2-D mesh.

        Each device scores + masks only its (I/m, d) table block against its
        'data' batch slice with the Pallas fused kernel, takes a LOCAL
        top-K with global item ids, then the (B, K) candidate lists are
        all-gathered over 'model' (tiny next to the (B, I) score matrix)
        and merge-reduced to the exact global top-K. This is the
        big-catalog path (VERDICT r2 weak #7): HBM and FLOPs per device
        scale 1/m instead of replicating the full table.
        """
        from jax.sharding import PartitionSpec as P

        from neurec_tpu.ops.graph import _shard_map
        from neurec_tpu.ops.pallas_kernels import masked_scores

        shard_map, rep_kw = _shard_map()
        mesh = self.mesh
        n_model = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]
        num_items = self.num_items
        i_pad = (-num_items) % n_model
        I_m = (num_items + i_pad) // n_model

        def body(u_vecs, item_block, train_rows):
            off = jax.lax.axis_index("model").astype(jnp.int32) * I_m
            # global -> block-local train ids; out-of-block ids map past the
            # catalog so build_train_mask's scatter drops them
            local_rows = jnp.where(
                (train_rows >= off) & (train_rows < off + I_m),
                train_rows - off,
                jnp.int32(2 ** 30),
            )
            masked = masked_scores(
                u_vecs, item_block, local_rows, interpret=interpret
            )                                              # (B, I_m)
            # table pad rows (global id >= num_items) must never rank
            gcol = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1) + off
            masked = jnp.where(gcol < num_items, masked, -jnp.inf)
            k_local = min(K, I_m)
            vals, ids = jax.lax.top_k(masked, k_local)
            gids = ids.astype(jnp.int32) + off
            # (m, B, k_local) -> (B, m*k_local) candidates, exact merge
            vals_all = jax.lax.all_gather(vals, "model")
            gids_all = jax.lax.all_gather(gids, "model")
            B = vals.shape[0]
            vals_cat = vals_all.transpose(1, 0, 2).reshape(B, -1)
            gids_cat = gids_all.transpose(1, 0, 2).reshape(B, -1)
            mvals, midx = jax.lax.top_k(vals_cat, K)
            return jnp.take_along_axis(gids_cat, midx, axis=1)

        sharded = shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data", None), P("model", None), P("data", None)),
            out_specs=P("data", None),
            **rep_kw,
        )

        def topk_fn(u_vecs, item_table, train_rows):
            if i_pad:
                item_table = jnp.pad(item_table, ((0, i_pad), (0, 0)))
            return sharded(u_vecs, item_table, train_rows)

        return topk_fn

    def _make_eval_step(self, predict_fn: PredictFn):
        num_items = self.num_items
        K = min(self.max_top, num_items)

        # factorized models (scores == u_vecs @ item_table.T) use the Pallas
        # fused score+mask kernel on TPU — one pass over the score matrix
        # instead of XLA's concat/scatter/slice chain
        model = getattr(predict_fn, "__self__", None)
        factorized = getattr(model, "eval_embeddings", None)
        interpret = _pallas_interpret_forced()
        use_pallas = factorized is not None and (
            interpret or jax.devices()[0].platform.lower() != "cpu"
        )
        item_shard_topk = None
        use_bits = False
        mode = self._item_shard_mode()
        if use_pallas:
            from neurec_tpu.ops import pallas_kernels

            mesh_axes = (
                dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
                if self.mesh is not None
                else {}
            )
            if (
                mesh_axes.get("model", 1) > 1
                and "data" in mesh_axes
                and (
                    mode == "on"
                    or (mode == "auto" and num_items >= _ITEM_SHARD_THRESHOLD)
                )
            ):
                item_shard_topk = self._make_item_sharded_topk(K, interpret)

            def masked_fn(u_vecs, item_table, train_rows):
                return pallas_kernels.masked_scores(
                    u_vecs, item_table, train_rows, interpret=interpret
                )

        # default full-catalog path: XLA-fused bit-plane masking from the
        # pre-packed per-eval-user bitmap — the plane expansion + where
        # fuse into the score producer's epilogue (1.33x production eval
        # at gowalla scale, bit-exact: benchmarks/eval_bits_prod_ab.json)
        # and the formulation is plain XLA, so it runs on any platform;
        # factorized models additionally shard_map score+mask+topk over
        # 'data' on a mesh (GSPMD alone all-gathers in front of TopK)
        use_bits = item_shard_topk is None and self._premask_enabled()
        if use_bits:
            i_p8 = self._items_pad8

            def bits_mask_scores(scores_ip8, bits):
                """where(-inf) at packed train bits; fuses into the
                producer's epilogue (scores must be padded to I_p8)."""
                planes = jnp.arange(8, dtype=jnp.uint8)
                hit = (
                    (bits[:, None, :] >> planes[None, :, None])
                    & jnp.uint8(1)
                ).reshape(bits.shape[0], i_p8)              # plane-major id
                return jnp.where(hit != 0, -jnp.inf, scores_ip8)[
                    :, :num_items
                ]

            def bits_topk(u_vecs, item_table, bits):
                scores = jnp.dot(
                    u_vecs, item_table.T,
                    preferred_element_type=jnp.float32,
                )                                           # (B, I_p8)
                _, topk = jax.lax.top_k(bits_mask_scores(scores, bits), K)
                return topk

            if (
                factorized is not None
                and self.mesh is not None
                and self.mesh.size > 1
                and "data" in self.mesh.axis_names
            ):
                # GSPMD partitions the fused score matmul fine but
                # all-gathers the (B, I) matrix in front of TopK (seen in
                # post-SPMD HLO; guarded by
                # tests/test_pallas_kernels.py::test_bits_path_partitions_under_mesh)
                # — shard_map the whole score+mask+topk block over 'data'
                # so each device ranks only its own batch slice
                from jax.sharding import PartitionSpec as P

                from neurec_tpu.ops.graph import _shard_map

                shard_map, _rep_kw = _shard_map()
                bits_topk = shard_map(
                    bits_topk,
                    mesh=self.mesh,
                    in_specs=(P("data"), P(), P("data")),
                    out_specs=P("data"),
                    **_rep_kw,
                )
        if use_pallas and not use_bits:
            if (
                item_shard_topk is None
                and self.mesh is not None
                and self.mesh.size > 1
                and "data" in self.mesh.axis_names
            ):
                # pallas_call is not SPMD-partitionable by GSPMD, so under a
                # multi-chip mesh the kernel is manually partitioned with
                # shard_map: each device scores+masks its own batch slice
                # against a (gathered) full item table — the table (I, d) is
                # far smaller than the score matrix (B, I) a top_k-side
                # gather would move. Axes the specs don't name ('model')
                # replicate the kernel; eval scales with the 'data' axis.
                from jax.sharding import PartitionSpec as P

                from neurec_tpu.ops.graph import _shard_map

                shard_map, _rep_kw = _shard_map()
                masked_fn = shard_map(
                    masked_fn,
                    mesh=self.mesh,
                    in_specs=(P("data"), P(), P("data")),
                    out_specs=P("data"),
                    **_rep_kw,
                )
        if mode == "on" and item_shard_topk is None:
            # explicit request that cannot engage — say so instead of
            # silently running the replicated-table (or scatter-mask) path
            if jax.process_index() == 0:
                _log.warning(
                    "eval_item_shard=on ignored: requires a mesh with "
                    "'data' and 'model' (>1) axes and a model exposing "
                    "eval_embeddings (factorized scores); falling back to "
                    "the replicated evaluator path"
                )

        def full_catalog_step(
            params, users, mask_arg, test_rows, test_lens, valid
        ):
            # mask_arg: pre-packed bits rows when use_bits, else padded
            # sorted train rows
            if use_pallas and item_shard_topk is not None:
                u_vecs, item_table = factorized(params, users)
                topk = item_shard_topk(
                    u_vecs.astype(jnp.float32),
                    item_table.astype(jnp.float32),
                    mask_arg,
                )
            elif use_bits and factorized is not None:
                u_vecs, item_table = factorized(params, users)
                if self._items_pad8 != num_items:
                    item_table = jnp.pad(
                        item_table,
                        ((0, self._items_pad8 - num_items), (0, 0)),
                    )
                topk = bits_topk(
                    u_vecs.astype(jnp.float32),
                    item_table.astype(jnp.float32),
                    mask_arg,
                )
            else:
                if use_bits:
                    # non-factorized models: same fused bit-plane mask on
                    # predict's output (replaces the concat/scatter/slice
                    # chain); GSPMD behavior matches the old scatter path
                    scores = predict_fn(params, users).astype(jnp.float32)
                    if self._items_pad8 != num_items:
                        scores = jnp.pad(
                            scores,
                            ((0, 0), (0, self._items_pad8 - num_items)),
                            constant_values=-jnp.inf,
                        )
                    masked = bits_mask_scores(scores, mask_arg)
                elif use_pallas:
                    u_vecs, item_table = factorized(params, users)
                    masked = masked_fn(
                        u_vecs.astype(jnp.float32),
                        item_table.astype(jnp.float32),
                        mask_arg,
                    )
                else:
                    scores = predict_fn(params, users).astype(jnp.float32)
                    B = scores.shape[0]
                    ext = jnp.concatenate(
                        [scores, jnp.zeros((B, 1), jnp.float32)], axis=1
                    )
                    ext = ext.at[jnp.arange(B)[:, None], mask_arg].set(-jnp.inf)
                    masked = ext[:, :num_items]
                _, topk = jax.lax.top_k(masked, K)
            hits = hit_matrix(topk, test_rows, test_lens)
            m = all_metrics(hits, test_lens)  # (B, 5, K)
            w = valid.astype(jnp.float32)
            return jnp.sum(m * w[:, None, None], axis=0), jnp.sum(w)

        def candidate_step(params, users, cand_rows, n_pos, valid):
            scores = predict_fn(params, users).astype(jnp.float32)
            B = scores.shape[0]
            ext = jnp.concatenate(
                [scores, jnp.full((B, 1), -jnp.inf, jnp.float32)], axis=1
            )
            cscores = jnp.take_along_axis(ext, cand_rows, axis=1)  # (B, C)
            Kc = min(K, cand_rows.shape[1])
            _, topk = jax.lax.top_k(cscores, Kc)
            hits = (topk < n_pos[:, None]).astype(jnp.float32)
            if Kc < K:  # pad rank axis so output shape is (B, 5, K)
                hits = jnp.pad(hits, ((0, 0), (0, K - Kc)))
            m = all_metrics(hits, n_pos)
            w = valid.astype(jnp.float32)
            return jnp.sum(m * w[:, None, None], axis=0), jnp.sum(w)

        # models whose item/user tables are user-independent (graph
        # propagation, AE decoders...) expose eval_tables(params) so the
        # table computation hoists OUT of the per-batch scan — XLA does
        # not hoist a loop-invariant pallas_call/SpMM chain itself, so
        # LightGCN-family eval otherwise re-propagates every batch
        tables_fn = (
            getattr(model, "eval_tables", None) if use_bits else None
        )

        def metric_tail(topk, sel, valid):
            hits = hit_matrix(topk, self._test_rows[sel], self._test_lens[sel])
            m = all_metrics(hits, self._test_lens[sel])  # (B, 5, K)
            w = valid.astype(jnp.float32)
            return jnp.sum(m * w[:, None, None], axis=0), jnp.sum(w)

        # the whole evaluation — every batch — as ONE device program:
        # lax.scan over (n_batches, B) position blocks, accumulating the
        # metric sums on device, so an eval pass is a single dispatch.
        def full_catalog_all(params, users_b, sel_b, valid_b, bits_table):
            # bits_table rides as a jit ARGUMENT: a device-array closure
            # constant is fetched host-side at lowering and shipped with
            # the program to the remote compile service (HTTP 413 at
            # gowalla scale)
            hoisted = None
            if tables_fn is not None:
                u_table, item_table = tables_fn(params)
                if self._items_pad8 != num_items:
                    item_table = jnp.pad(
                        item_table,
                        ((0, self._items_pad8 - num_items), (0, 0)),
                    )
                hoisted = (
                    u_table.astype(jnp.float32),
                    item_table.astype(jnp.float32),
                )

            def body(carry, xs):
                total, count = carry
                users, sel, valid = xs
                if hoisted is not None:
                    u_table, item_table = hoisted
                    topk = bits_topk(
                        u_table[users], item_table, bits_table[sel]
                    )
                    msum, wsum = metric_tail(topk, sel, valid)
                else:
                    mask_arg = (
                        bits_table[sel]
                        if use_bits
                        else self._train_rows[users]
                    )
                    msum, wsum = full_catalog_step(
                        params,
                        users,
                        mask_arg,
                        self._test_rows[sel],
                        self._test_lens[sel],
                        valid,
                    )
                return (total + msum, count + wsum), None

            init = (jnp.zeros((5, K)), jnp.zeros(()))
            (total, count), _ = jax.lax.scan(
                body, init, (users_b, sel_b, valid_b)
            )
            return total, count

        def candidate_all(params, users_b, sel_b, valid_b, bits_table):
            def body(carry, xs):
                total, count = carry
                users, sel, valid = xs
                msum, wsum = candidate_step(
                    params, users, self._cand_rows[sel], self._n_pos[sel], valid
                )
                return (total + msum, count + wsum), None

            init = (jnp.zeros((5, K)), jnp.zeros(()))
            (total, count), _ = jax.lax.scan(
                body, init, (users_b, sel_b, valid_b)
            )
            return total, count

        return jax.jit(full_catalog_all), jax.jit(candidate_all), use_bits

    def _get_steps(self, predict_fn: PredictFn):
        # bound methods are re-created on every attribute access, so key on
        # (underlying function, instance) — id(predict_fn) would retrace and
        # recompile the whole eval program at every call
        key = (
            id(getattr(predict_fn, "__func__", predict_fn)),
            id(getattr(predict_fn, "__self__", None)),
        )
        if key not in self._jit_cache:
            self._jit_cache[key] = self._make_eval_step(predict_fn)
        return self._jit_cache[key]

    # -- evaluation ---------------------------------------------------------
    def evaluate_raw(
        self,
        predict_fn: PredictFn,
        params,
        test_users: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """Mean per-user metric matrix, shape (metrics_num, len(top_show))."""
        if self.backend == "native":
            return self._evaluate_raw_native(predict_fn, params, test_users)
        full_all, cand_all, needs_bits = self._get_steps(predict_fn)
        bits = (
            self._get_bits_table()
            if needs_bits
            else jnp.zeros((1, 1), jnp.uint8)
        )
        if test_users is None:
            # hot path (every verbose-epoch eval): users are the full test
            # set in construction order, so positions are the identity and
            # the padded/blocked device arrays are reusable across calls —
            # the per-call host prep (a len(test_users) Python loop + fresh
            # device_puts) measurably dented gowalla-scale eval throughput
            if self._default_batches is not None:
                return self._finish_eval(full_all, cand_all, params,
                                         *self._default_batches, bits)
            users = self.test_users
            positions = np.arange(len(users), dtype=np.int32)
        else:
            users = np.asarray(list(test_users), dtype=np.int32)
            positions = np.asarray(
                [self._user_pos_index[int(u)] for u in users], dtype=np.int32
            )

        B = min(self.batch_size, max(len(users), 1))
        # under a mesh, user batches are sharded over the 'data' axis — each
        # chip scores/ranks its own slice of users and only the (5, K) metric
        # sums are psum-reduced, so eval throughput scales with the mesh
        n_data = 1
        if self.mesh is not None and "data" in self.mesh.axis_names:
            n_data = self.mesh.shape["data"]
            B = -(-B // n_data) * n_data  # round up to a multiple of n_data
        n_batches = (len(users) + B - 1) // B
        n_pad = n_batches * B
        valid = np.zeros(n_pad, dtype=np.float32)
        valid[: len(users)] = 1.0
        sel = np.zeros(n_pad, dtype=np.int32)
        sel[: len(users)] = positions
        users_pad = np.zeros(n_pad, dtype=np.int32)
        users_pad[: len(users)] = users

        users_b = users_pad.reshape(n_batches, B)
        sel_b = sel.reshape(n_batches, B)
        valid_b = valid.reshape(n_batches, B)
        if n_data > 1:
            # multi-host safe: every process holds the full batch blocks and
            # contributes its local devices' slices (parallel/mesh.py)
            from jax.sharding import NamedSharding, PartitionSpec

            from neurec_tpu.parallel.mesh import global_device_put

            bsh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            users_b = global_device_put(users_b, bsh)
            sel_b = global_device_put(sel_b, bsh)
            valid_b = global_device_put(valid_b, bsh)
        else:
            users_b = jnp.asarray(users_b)
            sel_b = jnp.asarray(sel_b)
            valid_b = jnp.asarray(valid_b)
        if test_users is None:
            self._default_batches = (users_b, sel_b, valid_b)
        return self._finish_eval(
            full_all, cand_all, params, users_b, sel_b, valid_b, bits
        )

    def _finish_eval(
        self, full_all, cand_all, params, users_b, sel_b, valid_b, bits
    ):
        if self.user_neg_test is not None:
            total, count = cand_all(params, users_b, sel_b, valid_b, bits)
        else:
            total, count = full_all(params, users_b, sel_b, valid_b, bits)

        mean = (
            np.asarray(total, dtype=np.float64) / max(float(count), 1.0)
        ).astype(np.float32)  # (5, K)
        k_idx = np.minimum(self.top_show, self.num_items) - 1
        return mean[self._metric_rows][:, k_idx]

    def _evaluate_raw_native(
        self,
        predict_fn: PredictFn,
        params,
        test_users: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """Host backend: scores come back from predict_fn, ranking + metric
        kernels run on the C++ thread pool (native/neurec_native.cpp) — the
        reference's cpp backend shape (uni_evaluator.py:101-157), selectable
        at runtime via eval_backend=native."""
        from neurec_tpu import native

        if test_users is None:
            users = self.test_users
        else:
            users = np.asarray(list(test_users), dtype=np.int32)
        K = min(self.max_top, self.num_items)
        B = min(self.batch_size, max(len(users), 1))
        total = np.zeros((self.metrics_num, K), dtype=np.float64)
        count = 0
        for lo in range(0, len(users), B):
            batch = users[lo : lo + B]
            scores = np.asarray(
                predict_fn(params, jnp.asarray(batch)), dtype=np.float32
            )
            nb = scores.shape[0]
            ext = np.concatenate(
                [scores, np.full((nb, 1), -np.inf, np.float32)], axis=1
            )
            if self.user_neg_test is not None:
                sel = [self._user_pos_index[int(u)] for u in batch]
                cand = np.asarray(self._cand_rows)[sel]
                cscores = np.take_along_axis(ext, cand, axis=1)
                truth = [
                    list(range(int(n))) for n in np.asarray(self._n_pos)[sel]
                ]
                per_user = native.eval_score_matrix(
                    cscores, truth, self.metrics, K, n_threads=self.num_thread
                )
            else:
                ext[np.arange(nb)[:, None], self._train_rows_np[batch]] = -np.inf
                truth = [list(self.user_pos_test[int(u)]) for u in batch]
                per_user = native.eval_score_matrix(
                    ext[:, : self.num_items], truth, self.metrics, K,
                    n_threads=self.num_thread,
                )
            total += per_user.reshape(nb, self.metrics_num, K).sum(axis=0)
            count += nb
        mean = (total / max(count, 1)).astype(np.float32)
        k_idx = np.minimum(self.top_show, self.num_items) - 1
        return mean[:, k_idx]

    def evaluate(
        self,
        predict_fn: PredictFn,
        params,
        test_users: Optional[Sequence[int]] = None,
    ) -> str:
        result = self.evaluate_raw(predict_fn, params, test_users).reshape(-1)
        return "\t".join(("%.8f" % x).ljust(12) for x in result)


class GroupedEvaluator:
    """Evaluate per user group bucketed by train-interaction count.

    Parity: grouped_evaluator.py:12-112, including the ``(lo,hi]:`` labels
    and discarding users above the last bound.
    """

    def __init__(
        self,
        user_train_dict,
        user_test_dict,
        user_neg_test=None,
        metric=None,
        group_view=None,
        top_k=50,
        batch_size=1024,
        num_items=None,
        num_thread=8,
        mesh=None,
        backend="device",
        item_shard="auto",
    ):
        if not isinstance(group_view, list):
            raise TypeError("The type of 'group_view' must be `list`!")
        self.evaluator = UniEvaluator(
            user_train_dict,
            user_test_dict,
            user_neg_test,
            metric=metric,
            top_k=top_k,
            batch_size=batch_size,
            num_items=num_items,
            num_thread=num_thread,
            mesh=mesh,
            backend=backend,
            item_shard=item_shard,
        )
        group_list = [0] + group_view
        group_info = [
            ("(%d,%d]:" % (g_l, g_h)).ljust(12)
            for g_l, g_h in zip(group_list[:-1], group_list[1:])
        ]
        all_test_user = list(user_test_dict.keys())
        num_interaction = [
            len(user_train_dict.get(u, ())) for u in all_test_user
        ]
        group_idx = np.searchsorted(group_list[1:], num_interaction)
        self.grouped_user: "OrderedDict[str, List[int]]" = OrderedDict()
        for gi in range(len(group_info)):
            members = [
                u for u, g in zip(all_test_user, group_idx) if g == gi
            ]
            if members:
                self.grouped_user[group_info[gi]] = members
        if not self.grouped_user:
            raise ValueError("The splitting of user groups is not suitable!")

    def metrics_info(self) -> str:
        return self.evaluator.metrics_info()

    def evaluate(self, predict_fn: PredictFn, params) -> str:
        result_to_show = ""
        for group, users in self.grouped_user.items():
            tmp_result = self.evaluator.evaluate(predict_fn, params, users)
            result_to_show = "%s\n%s\t%s" % (result_to_show, group, tmp_result)
        return result_to_show


class Evaluator:
    """Facade dispatching to UniEvaluator or GroupedEvaluator.

    Parity: proxy_evaluator.py:10-108.
    """

    def __init__(
        self,
        user_train_dict,
        user_test_dict,
        user_neg_test=None,
        metric=None,
        group_view=None,
        top_k=50,
        batch_size=1024,
        num_items=None,
        num_thread=8,
        mesh=None,
        backend="device",
        item_shard="auto",
    ):
        if group_view is not None:
            self.evaluator = GroupedEvaluator(
                user_train_dict,
                user_test_dict,
                user_neg_test,
                metric=metric,
                group_view=group_view,
                top_k=top_k,
                batch_size=batch_size,
                num_items=num_items,
                num_thread=num_thread,
                mesh=mesh,
                backend=backend,
                item_shard=item_shard,
            )
        else:
            self.evaluator = UniEvaluator(
                user_train_dict,
                user_test_dict,
                user_neg_test,
                metric=metric,
                top_k=top_k,
                batch_size=batch_size,
                num_items=num_items,
                num_thread=num_thread,
                mesh=mesh,
                backend=backend,
                item_shard=item_shard,
            )

    @classmethod
    def from_dataset(cls, dataset, config, mesh=None) -> "Evaluator":
        return cls(
            dataset.get_user_train_dict(),
            dataset.get_user_test_dict(),
            dataset.get_user_test_neg_dict(),
            metric=config.get("metric"),
            group_view=config.get("group_view"),
            top_k=config.get("topk", 50),
            batch_size=config.get("test_batch_size", 1024),
            num_items=dataset.num_items,
            num_thread=config.get("num_thread", 8),
            mesh=mesh,
            backend=config.get("eval_backend", "device"),
            item_shard=str(config.get("eval_item_shard", "auto")).lower(),
        )

    def metrics_info(self) -> str:
        return self.evaluator.metrics_info()

    def evaluate(self, predict_fn: PredictFn, params) -> str:
        return self.evaluator.evaluate(predict_fn, params)
