"""Top-k utilities for sharded MIPS.

``topk`` is a thin wrapper over ``jax.lax.top_k``; ``topk_merge`` merges
per-shard top-k results (scores + global ids) into a global top-k — the
device-side equivalent of FAISS's result heap merge, designed to run after a
``jax.lax.all_gather`` of per-shard candidates over the ICI mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk(scores, k: int):
    """Return (values, indices) of the k largest entries along the last axis."""
    return jax.lax.top_k(scores, k)


def topk_merge(scores, ids, k: int):
    """Merge candidate sets along the second-to-last axis.

    Args:
      scores: [..., S, K] per-shard top-k scores.
      ids:    [..., S, K] matching global ids (any integer dtype).
      k: number of results to keep.

    Returns:
      (merged_scores [..., k], merged_ids [..., k]) sorted descending.
    """
    flat_scores = jnp.reshape(scores, scores.shape[:-2] + (-1,))
    flat_ids = jnp.reshape(ids, ids.shape[:-2] + (-1,))
    vals, pos = jax.lax.top_k(flat_scores, k)
    return vals, jnp.take_along_axis(flat_ids, pos, axis=-1)
