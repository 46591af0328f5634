"""CFGAN — conditional vector-wise GAN for CF (Chae et al., CIKM 2018).

Parity with model/general_recommender/CFGAN.py:30-193:

* generator: sigmoid dense stack, row-condition -> full rating row;
  discriminator: sigmoid dense stack over [condition; (masked) row] -> logit;
* ZR (zero-reconstruction) and PM (partial-masking) negative masks sampled
  over each user's non-interacted items with ratios ZR_ratio / ZP_ratio
  (resampled every round, CFGAN.py:135-148) — here Bernoulli-sampled per
  batch on device (the reference draws an exact count without replacement);
* alternating step_D discriminator sub-epochs then step_G generator
  sub-epochs per round; one ``epoch`` here == one round, matching the
  reference's ``epochs / step_G`` outer loop;
* userBased or itemBased mode (transposed matrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurec_tpu.data.padded import build_padded_positives
from neurec_tpu.models.base import Recommender, register


def _dense_stack_init(rng, dims):
    xavier = jax.nn.initializers.glorot_uniform()
    layers = []
    for d_in, d_out in zip(dims[:-1], dims[1:]):
        rng, k = jax.random.split(rng)
        layers.append({"w": xavier(k, (d_in, d_out)), "b": jnp.zeros((d_out,))})
    return layers


def _sigmoid_stack(layers, x):
    n = len(layers)
    for i, l in enumerate(layers):
        x = x @ l["w"] + l["b"]
        if i < n - 1:
            x = jax.nn.sigmoid(x)
    return x


@register("CFGAN")
class CFGAN(Recommender):
    data_kind = "custom"

    def __init__(self, dataset, config):
        super().__init__(dataset, config)
        self.mode = config.get("mode", "itemBased")
        self.lr_G = float(config.get("lr_G", 0.0001))
        self.lr_D = float(config.get("lr_D", 0.0001))
        self.reg_G = float(config.get("reg_G", 0.001))
        self.reg_D = float(config.get("reg_D", 0.001))
        self.batchSize_G = int(config.get("batchSize_G", 128))
        self.batchSize_D = int(config.get("batchSize_D", 128))
        self.opt_G = config.get("opt_G", "adam")
        self.opt_D = config.get("opt_D", "adam")
        self.hiddenLayer_G = list(config.get("hiddenLayer_G", [300]))
        self.hiddenLayer_D = list(config.get("hiddenLayer_D", [250]))
        self.step_G = int(config.get("step_G", 5))
        self.step_D = int(config.get("step_D", 2))
        self.ZR_ratio = float(config.get("ZR_ratio", 0.4))
        self.ZP_ratio = float(config.get("ZP_ratio", 0.4))
        self.ZR_coefficient = float(config.get("ZR_coefficient", 0.1))

        matrix = dataset.train_matrix
        if self.mode == "itemBased":
            matrix = matrix.T.tocsr()
        self._n_rows, self._n_cols = matrix.shape
        padded = build_padded_positives(matrix)
        self._rows_idx = jnp.asarray(padded.items)       # (R, L) pad = n_cols
        self._lens = jnp.asarray(padded.lengths)
        # user-facing eval is always (users x items)
        self.epochs = int(self.epochs / self.step_G)
        if self.mode != "itemBased":
            # userBased predict only runs the generator on the batch's own
            # rows — hoisting a (U, I) matrix would cost memory for nothing
            self.eval_dense_scores = None

    def _make_opt(self, name, lr):
        return optax.adam(lr) if name == "adam" else optax.sgd(lr)

    def make_optimizer(self):
        return optax.identity()  # real optimizers live in init_opt_state

    def init_opt_state(self, params):
        g_tx = self._make_opt(self.opt_G, self.lr_G)
        d_tx = self._make_opt(self.opt_D, self.lr_D)
        return {"g": g_tx.init(params["gen"]), "d": d_tx.init(params["dis"])}

    def init_params(self, rng):
        kg, kd = jax.random.split(rng)
        n = self._n_cols
        return {
            "gen": _dense_stack_init(kg, [n] + self.hiddenLayer_G + [n]),
            "dis": _dense_stack_init(kd, [2 * n] + self.hiddenLayer_D + [1]),
        }

    def _make_cond_rows(self, idx):
        rows = self._rows_idx[idx]
        B = idx.shape[0]
        ext = jnp.zeros((B, self._n_cols + 1))
        ext = ext.at[jnp.arange(B)[:, None], rows].set(1.0)
        return ext[:, : self._n_cols]

    def _sample_mask(self, key, cond, ratio):
        """Bernoulli(ratio) over non-interacted entries, union positives."""
        bern = jax.random.bernoulli(key, ratio, cond.shape).astype(jnp.float32)
        return jnp.maximum(cond, bern * (1.0 - cond))

    def build_epoch(self, trainer):
        n_rows = self._n_rows
        g_tx = self._make_opt(self.opt_G, self.lr_G)
        d_tx = self._make_opt(self.opt_D, self.lr_D)

        def l2(tree):
            return sum(0.5 * jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))

        def bce(logits, target_ones):
            if target_ones:
                return jnp.mean(jax.nn.softplus(-logits))
            return jnp.mean(jax.nn.softplus(logits))

        def d_step(carry, xs):
            params, opt = carry
            idx, key = xs
            idx = trainer.dp_constrain(idx)
            cond = trainer.dp_constrain(self._make_cond_rows(idx))
            pm = self._sample_mask(key, cond, self.ZP_ratio)

            def d_loss_fn(dis):
                fake = jax.lax.stop_gradient(_sigmoid_stack(params["gen"], cond))
                d_fake = _sigmoid_stack(dis, jnp.concatenate([cond, fake * pm], 1))
                d_real = _sigmoid_stack(dis, jnp.concatenate([cond, cond], 1))
                return bce(d_real, True) + bce(d_fake, False) + self.reg_D * l2(dis)

            loss, grads = jax.value_and_grad(d_loss_fn)(params["dis"])
            updates, opt_d = d_tx.update(grads, opt["d"], params["dis"])
            params = dict(params, dis=optax.apply_updates(params["dis"], updates))
            return (params, dict(opt, d=opt_d)), loss

        def g_step(carry, xs):
            params, opt = carry
            idx, key = xs
            idx = trainer.dp_constrain(idx)
            k_zr, k_pm = jax.random.split(key)
            cond = trainer.dp_constrain(self._make_cond_rows(idx))
            zr = self._sample_mask(k_zr, cond, self.ZR_ratio) - cond  # negatives only
            pm = self._sample_mask(k_pm, cond, self.ZP_ratio)

            def g_loss_fn(gen):
                fake = _sigmoid_stack(gen, cond)
                d_fake = _sigmoid_stack(
                    params["dis"], jnp.concatenate([cond, fake * pm], 1)
                )
                adv = bce(d_fake, True)
                zr_loss = jnp.mean(jnp.sum(jnp.square(fake) * zr, axis=1))
                return adv + self.reg_G * l2(gen) + self.ZR_coefficient * zr_loss

            loss, grads = jax.value_and_grad(g_loss_fn)(params["gen"])
            updates, opt_g = g_tx.update(grads, opt["g"], params["gen"])
            params = dict(params, gen=optax.apply_updates(params["gen"], updates))
            return (params, dict(opt, g=opt_g)), loss

        def sub_epochs(params, opt, key, step_fn, B, n_reps):
            steps = max(n_rows // B, 1)
            loss = 0.0
            for r in range(n_reps):
                kp, ks, key = jax.random.split(jax.random.fold_in(key, r), 3)
                perm = jax.random.permutation(kp, n_rows)[: steps * B]
                keys = jax.random.split(ks, steps)
                (params, opt), losses = jax.lax.scan(
                    step_fn, (params, opt), (perm.reshape(steps, B), keys)
                )
                loss = jnp.mean(losses)
            return params, opt, loss

        def epoch(params, opt_state, key, epoch_idx):
            del epoch_idx
            kd, kg = jax.random.split(key)
            params, opt_state, _ = sub_epochs(
                params, opt_state, kd, d_step, self.batchSize_D, self.step_D
            )
            params, opt_state, g_loss = sub_epochs(
                params, opt_state, kg, g_step, self.batchSize_G, self.step_G
            )
            return params, opt_state, g_loss

        return jax.jit(epoch, donate_argnums=(0, 1))

    def loss(self, params, batch, weights):
        raise RuntimeError("CFGAN uses build_epoch (data_kind='custom')")

    def _all_ratings_t(self, params):
        """(U, I) full score matrix for itemBased mode: the generator maps
        every item row to per-item user scores; score(u, i) is column u of
        G(item rows)."""
        cond = self._make_cond_rows(jnp.arange(self._n_rows))
        return _sigmoid_stack(params["gen"], cond).T

    def eval_dense_scores(self, params):
        """Evaluator hoist hook (predict-kind): itemBased predict runs the
        FULL generator stack for one user batch, so inside the eval scan
        it would regenerate the whole catalog per batch (the reference
        computes allRatings once per evaluation, CFGAN.py:168-176);
        hoisting materializes the matrix once per eval call. Only defined
        for itemBased — userBased predict is batch-proportional (the
        __init__ deletes this attribute there)."""
        return self._all_ratings_t(params)

    def predict(self, params, users):
        if self.mode == "itemBased":
            return self._all_ratings_t(params)[users]
        cond = self._make_cond_rows(users)
        return _sigmoid_stack(params["gen"], cond)
