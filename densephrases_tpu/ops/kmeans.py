"""Lloyd k-means on TPU — the coarse-quantizer trainer.

Replaces FAISS's CPU/GPU k-means used to train the IVF coarse quantizer
(ref: build_phrase_index.py:96-142 IndexIVF* train). Everything is matmul:

- assignment: argmin ||x - c||² = argmin (||c||² - 2 x·c) — one [chunk, k]
  matmul per data chunk on the MXU, scanned over chunks.
- update: centroid sums accumulated as ``onehot(assign)ᵀ @ x`` — another
  matmul — so the whole iteration is MXU work with no scatters.
- empty clusters are re-seeded from random data points (FAISS does the same).

Runs entirely inside one jit per iteration; data stays on device.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_and_accumulate(x, centroids, *, chunk: int):
    """One Lloyd iteration body: returns (sums [k,D], counts [k], cost)."""
    n, d = x.shape
    k = centroids.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)  # [k]
    cbf = centroids.astype(jnp.bfloat16)

    def body(carry, x_chunk):
        sums, counts, cost = carry
        dots = jax.lax.dot_general(
            x_chunk.astype(jnp.bfloat16), cbf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, k]
        dist = c_sq[None, :] - 2.0 * dots
        assign = jnp.argmin(dist, axis=1)  # [chunk]
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)  # [chunk, k]
        sums = sums + jax.lax.dot_general(
            onehot, x_chunk.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
        cost = cost + jnp.sum(jnp.min(dist, axis=1))
        return (sums, counts, cost), None

    x_chunks = x.reshape(n // chunk, chunk, d)
    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0))
    (sums, counts, cost), _ = jax.lax.scan(body, init, x_chunks)
    return sums, counts, cost


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmeans_assign(x, centroids, *, chunk: int = 4096):
    """Assign rows of x to nearest centroid (L2). Returns int32 [N]."""
    n, d = x.shape
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)], axis=0)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)
    cbf = centroids.astype(jnp.bfloat16)

    def body(_, x_chunk):
        dots = jax.lax.dot_general(
            x_chunk.astype(jnp.bfloat16), cbf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(body, None, x.reshape(-1, chunk, d))
    return assigns.reshape(-1)[:n]


# host-block streaming: the corpus never lives on device in full — each
# block is uploaded, reduced, and dropped (device holds O(block) + [k, D]).
# int8 inputs are shipped as int8 (4× less transfer): assignment against
# L2 is affine-equivariant, so raw codes are assigned against transformed
# centroids c' = (c - offset)·scale, and Lloyd sums are fixed up on host:
# sum_deq = sum_raw/scale + offset·count.
_BLOCK = 262_144


def accumulate_blocks(x: np.ndarray, centroids: np.ndarray,
                      chunk: int = 4096, block: int = _BLOCK,
                      offset: float = 0.0, scale: float = 1.0):
    """Streamed Lloyd accumulation over host-resident data (f32 or int8 with
    (offset, scale) dequant contract). Returns (sums [k, D], counts [k],
    cost) as numpy, in DEQUANTIZED space."""
    n, d = x.shape
    k = centroids.shape[0]
    quant = x.dtype == np.int8
    c_eff = ((centroids - offset) * scale).astype(np.float32) if quant \
        else centroids
    c_dev = jnp.asarray(c_eff)
    sums = np.zeros((k, d), np.float32)
    counts = np.zeros((k,), np.float32)
    cost = 0.0
    for b0 in range(0, n, block):
        xb = np.ascontiguousarray(x[b0:b0 + block])
        pad = (-len(xb)) % chunk
        if pad:
            xb = np.concatenate([xb, np.zeros((pad, d), xb.dtype)])
        s, c, co = _assign_and_accumulate(jnp.asarray(xb), c_dev, chunk=chunk)
        s, c = np.array(s), np.array(c)
        if pad:
            zi = int(np.argmin(np.sum(c_eff ** 2, axis=1)))
            c[zi] -= pad
        sums += s
        counts += c
        cost += float(co)
    if quant:
        sums = sums / scale + offset * counts[:, None]
    return sums, counts, cost


def assign_blocks(x: np.ndarray, centroids: np.ndarray,
                  chunk: int = 4096, block: int = _BLOCK,
                  offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Streamed nearest-centroid assignment (f32, or int8 shipped raw).
    Returns int32 [N] (numpy)."""
    n = x.shape[0]
    quant = x.dtype == np.int8
    c_eff = ((centroids - offset) * scale).astype(np.float32) if quant \
        else centroids
    c_dev = jnp.asarray(c_eff)
    out = np.empty(n, np.int32)
    for b0 in range(0, n, block):
        xb = jnp.asarray(np.ascontiguousarray(x[b0:b0 + block]))
        out[b0:b0 + block] = np.asarray(
            kmeans_assign(xb, c_dev, chunk=min(chunk, max(len(xb), 8))))
    return out


def kmeans(x: np.ndarray, k: int, iters: int = 10, seed: int = 0,
           chunk: int = 4096, verbose: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Train k centroids. Returns (centroids [k, D] f32, assignments [N] i32).

    Host-side driver: per-iteration device work is jitted and streamed in
    host blocks (device memory O(block), not O(corpus)); empty-cluster
    re-seeding happens between iterations on the host (rare path).
    """
    n, d = x.shape
    assert n >= k, f"need at least k={k} points, got {n}"
    rng = np.random.default_rng(seed)
    centroids = np.asarray(x[rng.choice(n, size=k, replace=False)], np.float32)

    for it in range(iters):
        sums, counts, cost = accumulate_blocks(x, centroids, chunk=chunk)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        n_empty = int((~nonempty).sum())
        if n_empty:
            centroids[~nonempty] = x[rng.choice(n, size=n_empty, replace=False)]
        if verbose:
            logger.info("kmeans iter %d: cost=%.1f empty=%d", it, float(cost), n_empty)

    assigns = assign_blocks(x, centroids, chunk=chunk)
    return centroids, assigns
