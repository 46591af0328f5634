"""FPMC — factorized personalized Markov chains (Rendle et al., WWW 2010).

Parity with model/sequential_recommender/FPMC.py:17-165:
score(u, l, i) = <UI_u, IU_i> + <IL_i, LI_l> with l the previous item
(FPMC.py:61-71); pairwise (TimeOrderPairwiseSampler, high_order=1) or
pointwise training; reg_mf * l2(batch lookups).

TPU-first predict: scores = UI_u @ IU^T + LI_{last(u)} @ IL^T — two matmuls
instead of the reference's per-user full-item feeds (FPMC.py:139-146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss


@register("FPMC")
class FPMC(SequentialMixin, Recommender):
    needs_time = True
    high_order = 1

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.reg_mf = float(config.get("reg_mf", 0.0))
        self.is_pairwise = bool(config.get("is_pairwise", True))
        self.loss_function = config.get("loss_function", "bpr")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.init_method = config.get("init_method", "normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "time_pairwise" if self.is_pairwise else "time_pointwise"
        self._setup_recent(dataset)

    def init_params(self, rng):
        init = get_initializer(self.init_method, self.stddev)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d = self.embedding_size
        return {
            "UI": init(k1, (self.num_users, d)),
            "IU": init(k2, (self.num_items, d)),
            "IL": init(k3, (self.num_items, d)),
            "LI": init(k4, (self.num_items, d)),
        }

    def _score(self, params, users, recent, items):
        ui = params["UI"][users]
        iu = params["IU"][items]
        il = params["IL"][items]
        li = params["LI"][recent]
        y = jnp.sum(ui * iu, axis=-1) + jnp.sum(il * li, axis=-1)
        return y, (ui, iu, il, li)

    def loss(self, params, batch, weights):
        users = batch["users"]
        recent = batch["recent_items"].reshape(-1)  # high_order == 1
        w = weights[:, None]
        if self.is_pairwise:
            y_pos, (ui, iu1, il1, li) = self._score(
                params, users, recent, batch["pos_items"]
            )
            y_neg, (_, iu2, il2, _) = self._score(
                params, users, recent, batch["neg_items"]
            )
            return pairwise_loss(
                self.loss_function, y_pos - y_neg, weights=weights
            ) + self.reg_mf * l2_loss(
                ui * w, iu1 * w, il1 * w, li * w, iu2 * w, il2 * w
            )
        y, (ui, iu, il, li) = self._score(params, users, recent, batch["items"])
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mf * l2_loss(ui * w, iu * w, il * w, li * w)

    def predict(self, params, users):
        last = self._recent_items[users, -1]  # (B,)
        return params["UI"][users] @ params["IU"].T + (
            params["LI"][last] @ params["IL"].T
        )

    def eval_embeddings(self, params, users):
        last = self._recent_items[users, -1]
        u_vecs = jnp.concatenate(
            [params["UI"][users], params["LI"][last]], axis=1
        )
        table = jnp.concatenate([params["IU"], params["IL"]], axis=1)
        return u_vecs, table
