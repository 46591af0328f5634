"""FPMCplus — FPMC with attention over the recent-item window.

Parity with model/sequential_recommender/FPMCplus.py:55-130: attention MLP
``A(b,h) = softmax_h(h_vec . tanh([UI_u; IL_i; LI_h] W + b))`` over the
``high_order`` recent items, conditioned on the candidate item; score =
<UI_u, IU_i> + <IL_i, sum_h A(b,h) LI_h>. Pairwise/pointwise + reg_mf on
batch lookups, reg_w on (W, h) (pairwise only, mirroring the reference).

The candidate-conditioned attention makes full-catalog predict O(B*I*H*w);
it is chunked over items on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neurec_tpu.models.base import Recommender, register
from neurec_tpu.models.sequential.seq_common import SequentialMixin
from neurec_tpu.ops.initializers import get_initializer
from neurec_tpu.ops.losses import l2_loss, pairwise_loss, pointwise_loss

_PREDICT_CHUNK = 1024


@register("FPMCplus")
class FPMCplus(SequentialMixin, Recommender):
    needs_time = True

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.embedding_size = int(config.get("embedding_size", 16))
        self.weight_size = int(config.get("weight_size", 16))
        self.high_order = int(config.get("high_order", 3))
        self.reg_mf = float(config.get("reg_mf", 1e-5))
        self.reg_w = float(config.get("reg_w", 1e-3))
        self.is_pairwise = bool(config.get("is_pairwise", True))
        self.loss_function = config.get("loss_function", "BPR")
        self.num_negatives = int(config.get("num_neg", config.get("num_negatives", 1)))
        self.embed_init_method = config.get("embed_init_method", "tnormal")
        self.weight_init_method = config.get("weight_init_method", "he_normal")
        self.stddev = float(config.get("stddev", 0.01))
        self.data_kind = "time_pairwise" if self.is_pairwise else "time_pointwise"
        self._setup_recent(dataset)

    def init_params(self, rng):
        e_init = get_initializer(self.embed_init_method, self.stddev)
        w_init = get_initializer(self.weight_init_method, self.stddev)
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        d, w = self.embedding_size, self.weight_size
        return {
            "UI": e_init(k1, (self.num_users, d)),
            "IU": e_init(k2, (self.num_items, d)),
            "IL": e_init(k3, (self.num_items, d)),
            "LI": e_init(k4, (self.num_items, d)),
            "W": w_init(k5, (3 * d, w)),
            "b": w_init(k6, (1, w)),
            "h": jnp.ones((w, 1)),
        }

    def _attended_recent(self, params, ui, il, li):
        """ui (B,d), il (B,d) candidate-side, li (B,H,d) -> (B,d)."""
        H = li.shape[1]
        ui_t = jnp.broadcast_to(ui[:, None, :], li.shape)
        il_t = jnp.broadcast_to(il[:, None, :], li.shape)
        x = jnp.concatenate([ui_t, il_t, li], axis=-1)          # (B,H,3d)
        mlp = jnp.tanh(x @ params["W"] + params["b"])           # (B,H,w)
        logits = (mlp @ params["h"])[:, :, 0]                   # (B,H)
        att = jax.nn.softmax(logits, axis=1)[:, :, None]
        return jnp.sum(att * li, axis=1)

    def _score(self, params, users, recent, items):
        ui = params["UI"][users]
        iu = params["IU"][items]
        il = params["IL"][items]
        li = params["LI"][recent]                               # (B,H,d)
        short = self._attended_recent(params, ui, il, li)
        y = jnp.sum(ui * iu, axis=-1) + jnp.sum(il * short, axis=-1)
        return y, (ui, iu, il, li)

    def loss(self, params, batch, weights):
        users = batch["users"]
        recent = batch["recent_items"].reshape(-1, self.high_order)
        w = weights[:, None]
        w3 = weights[:, None, None]
        if self.is_pairwise:
            y_pos, (ui, iu1, il1, li) = self._score(
                params, users, recent, batch["pos_items"]
            )
            y_neg, (_, iu2, il2, _) = self._score(
                params, users, recent, batch["neg_items"]
            )
            return (
                pairwise_loss(self.loss_function, y_pos - y_neg, weights=weights)
                + self.reg_mf
                * l2_loss(ui * w, iu1 * w, il1 * w, li * w3, iu2 * w, il2 * w)
                + self.reg_w * l2_loss(params["W"], params["h"])
            )
        y, (ui, iu, il, li) = self._score(params, users, recent, batch["items"])
        return pointwise_loss(
            self.loss_function, batch["labels"], y, weights=weights
        ) + self.reg_mf * l2_loss(ui * w, iu * w, il * w, li * w3)

    def predict(self, params, users):
        B = users.shape[0]
        H, d = self.high_order, self.embedding_size
        ui = params["UI"][users]                                # (B,d)
        li = params["LI"][self._recent_items[users]]            # (B,H,d)
        num_items = self.num_items
        chunk = min(_PREDICT_CHUNK, num_items)
        n_chunks = -(-num_items // chunk)
        padded = n_chunks * chunk
        iu_all, il_all = params["IU"], params["IL"]
        if padded != num_items:
            iu_all = jnp.pad(iu_all, ((0, padded - num_items), (0, 0)))
            il_all = jnp.pad(il_all, ((0, padded - num_items), (0, 0)))
        iu_all = iu_all.reshape(n_chunks, chunk, d)
        il_all = il_all.reshape(n_chunks, chunk, d)

        # factor the attention MLP input: [ui W1 + b] + [il W2] + [li W3]
        W1, W2, W3 = jnp.split(params["W"], 3, axis=0)
        ui_part = ui @ W1 + params["b"]                         # (B,w)
        li_part = li @ W3                                       # (B,H,w)

        def score_chunk(carry, xs):
            iu_c, il_c = xs                                     # (C,d)
            il_part = il_c @ W2                                 # (C,w)
            pre = (
                ui_part[:, None, None, :]
                + il_part[None, :, None, :]
                + li_part[:, None, :, :]
            )                                                   # (B,C,H,w)
            logits = (jnp.tanh(pre) @ params["h"])[..., 0]      # (B,C,H)
            att = jax.nn.softmax(logits, axis=-1)
            short = jnp.einsum("bch,bhd->bcd", att, li)         # (B,C,d)
            score = ui @ iu_c.T + jnp.einsum("cd,bcd->bc", il_c, short)
            return carry, score

        _, chunks = jax.lax.scan(score_chunk, 0, (iu_all, il_all))
        return jnp.moveaxis(chunks, 0, 1).reshape(B, padded)[:, :num_items]
