"""Batch top-K recommendation export — the production serving job.

The reference stops at evaluation; actually *serving* its models means
re-implementing ranking by hand. Here `batch_topk` produces top-K item
lists for any set of users in evaluator style: one jitted step per user
batch — full-catalog scores, already-consumed items masked to -inf via
padded sorted rows (no (U, I) dense mask), `lax.top_k` on device — and
only the (B, K) ids/scores ever reach the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurec_tpu.data.padded import build_padded_positives


def batch_topk(
    model,
    params,
    k: int,
    users: Optional[np.ndarray] = None,
    train_matrix=None,
    batch_size: int = 512,
):
    """Top-K items per user.

    Args:
      model: a registered recommender (uses its jit-traceable ``predict``).
      params: trained parameter pytree.
      k: list length.
      users: int array of user ids; default = all users.
      train_matrix: optional CSR of already-consumed items to exclude
        (pass ``dataset.train_matrix``; None ranks the full catalog).
      batch_size: users per device dispatch.

    Returns:
      (item_ids, scores): int32/float32 arrays of shape (len(users), k).
    """
    num_items = model.num_items
    if users is None:
        users = np.arange(model.num_users, dtype=np.int32)
    users = np.asarray(users, dtype=np.int32)
    i_p8 = num_items + ((-num_items) % 1024)
    if train_matrix is not None:
        # consumed-item masks are static per call: bit-plane-pack them
        # once (eval/evaluator.py's default path — the expansion +
        # where fuse into predict's epilogue, replacing the per-batch
        # (B, I) scatter; 1.33x at gowalla scale,
        # benchmarks/eval_bits_prod_ab.json)
        from neurec_tpu.ops.pallas_kernels import pack_train_bits

        padded = build_padded_positives(train_matrix)
        train_rows = jnp.asarray(padded.items)
        pack = jax.jit(
            lambda rows: pack_train_bits(rows, num_items, block_items=i_p8)
        )
        bits_parts = []
        for i in range(0, train_rows.shape[0], 4096):
            bits_parts.append(pack(train_rows[i : i + 4096]))
        bits_all = (
            jnp.concatenate(bits_parts, axis=0)
            if len(bits_parts) > 1
            else bits_parts[0]
        )
    else:
        bits_all = jnp.zeros((model.num_users, i_p8 // 8), jnp.uint8)

    @jax.jit
    def step(p, batch_users, bits):
        scores = model.predict(p, batch_users).astype(jnp.float32)
        B = scores.shape[0]
        if i_p8 != num_items:
            scores = jnp.pad(
                scores, ((0, 0), (0, i_p8 - num_items)),
                constant_values=-jnp.inf,
            )
        planes = jnp.arange(8, dtype=jnp.uint8)
        hit = (
            (bits[:, None, :] >> planes[None, :, None]) & jnp.uint8(1)
        ).reshape(B, i_p8)
        masked = jnp.where(hit != 0, -jnp.inf, scores)[:, :num_items]
        return jax.lax.top_k(masked, k)

    n = len(users)
    pad = (-n) % batch_size
    padded_users = np.concatenate([users, np.zeros(pad, np.int32)]) if pad else users
    out_scores, out_items = [], []
    for i in range(0, len(padded_users), batch_size):
        bu = jnp.asarray(padded_users[i : i + batch_size])
        s, idx = step(params, bu, bits_all[bu])
        out_scores.append(np.asarray(s))
        out_items.append(np.asarray(idx))
    items = np.concatenate(out_items)[:n]
    scores = np.concatenate(out_scores)[:n]
    return items.astype(np.int32), scores.astype(np.float32)
