"""OPQ: learned rotation that minimizes PQ reconstruction error.

Replaces FAISS's ``OPQMatrix`` (ref: build_phrase_index.py:109-116,
OPQMatrix(d, M) with niter=10 wrapped in IndexPreTransform; applied at serve
time as ``vec · R``, ref: index.py:32,338-345).

Alternating optimization (the classic OPQ-NP algorithm):
  1. Y = X R; fit/encode PQ on Y → reconstruction Ŷ
  2. R ← Procrustes solution of min_R ||X R - Ŷ||_F over orthogonal R,
     i.e. SVD(Xᵀ Ŷ) = U Σ Vᵀ → R = U Vᵀ

TPU-native layout: the training sample is uploaded ONCE (raw int8 when the
caller holds quantized codes — 4× less transfer, dequantized on device) and
every O(N·D) quantity stays device-resident: the rotated sample, the M
batched sub-k-means (one streamed-Lloyd dispatch for all M subspaces), the
PQ assignment, and the XᵀŶ accumulation (Ŷ is reconstructed chunkwise
inside the scan and never materialized). Only the [D, D] cross matrix comes
back to the host for the SVD — a 768×768 problem, negligible.
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.ops.pq import (
    PQCodebook,
    _dequant_dev,
    _mm_dtype,
    _train_pq_device,
)

logger = logging.getLogger(__name__)


@dataclass
class OPQ:
    rotation: np.ndarray  # [D, D] orthogonal
    pq: PQCodebook

    def apply(self, x: np.ndarray) -> np.ndarray:
        return x @ self.rotation


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def _opq_cross(xd, y, books, *, row_chunk: int):
    """Streamed XᵀŶ + reconstruction error.

    xd: [N, D] f32 original rows (device); y: [N, D] f32 rotated rows;
    books: [M, K, dsub]. Per chunk: PQ-assign y, reconstruct ŷ via a
    one-hot matmul (no gathers), accumulate xᵀŷ and ||y − ŷ||². Returns
    (xty [D, D] f32, err_sum scalar). Ŷ never exists at full size."""
    n, d = y.shape
    m, k, s = books.shape
    c_sq = jnp.sum(books.astype(jnp.float32) ** 2, axis=-1)  # [M, K]
    mdt = _mm_dtype()
    b_mm = books.astype(mdt)

    def body(carry, ci):
        xty, err = carry
        yc = jax.lax.dynamic_slice(y, (ci * row_chunk, 0), (row_chunk, d))
        xc = jax.lax.dynamic_slice(xd, (ci * row_chunk, 0), (row_chunk, d))
        q = yc.reshape(row_chunk, m, s).astype(mdt)
        dots = jnp.einsum("cms,mks->cmk", q, b_mm,
                          preferred_element_type=jnp.float32)
        a = jnp.argmin(c_sq[None] - 2.0 * dots, axis=-1)  # [rc, M]
        oh = jax.nn.one_hot(a, k, dtype=mdt)  # [rc, M, K]
        yh = jnp.einsum("cmk,mks->cms", oh, b_mm,
                        preferred_element_type=jnp.float32
                        ).reshape(row_chunk, d)
        # f32 inputs: the CPU backend has no bf16 2-D dot thunk, and this
        # [rc,D]ᵀ[rc,D] matmul is a negligible share of the pass anyway
        xty = xty + jnp.einsum("cd,ce->de", xc, yh,
                               preferred_element_type=jnp.float32)
        err = err + jnp.sum((yc - yh) ** 2)
        return (xty, err), None

    (xty, err), _ = jax.lax.scan(
        body, (jnp.zeros((d, d), jnp.float32), jnp.float32(0.0)),
        jnp.arange(n // row_chunk))
    return xty, err


@jax.jit
def _rotate_dev(xd, r):
    mdt = _mm_dtype()
    return jnp.dot(xd.astype(mdt), r.astype(mdt),
                   preferred_element_type=jnp.float32)


def train_opq(x: np.ndarray, m: int, nbits: int = 8, niter: int = 10,
              pq_iters: int = 6,
              seed: int = 0, verbose: bool = False, offset: float = 0.0,
              scale: float = 1.0, row_chunk: int = 4096,
              sub_cents: np.ndarray = None,
              sub_ids: np.ndarray = None) -> OPQ:
    """Train rotation + codebooks (niter=10 parity with the reference's
    OPQMatrix default, build_phrase_index.py:114).

    x: training sample — f32 rows, or RAW int8 codes with the
    (offset, scale) dequant contract (uploaded once as int8).
    sub_cents/sub_ids (optional): coarse centroids [nlist, D] f32 + each
    sample row's assignment [N] — train on RESIDUALS x − c (IVF
    by_residual), subtracted on device (no host f32 sample copy).
    nbits: codebook size per subspace (8 = reference parity; 4 = the
    fast-scan operating point, 16 centroids per subspace)."""
    assert nbits in (4, 8), f"nbits must be 4 or 8, got {nbits}"
    ksub = 1 << nbits
    n, d = x.shape
    rng = np.random.default_rng(seed)
    # init: random orthogonal rotation (FAISS inits from random rotation too)
    a = rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    r = q.astype(np.float32)

    rc = min(row_chunk, max(256, n))
    pad = (-n) % rc
    if pad:  # resample pad rows (double weight — harmless for a quantizer)
        pad_sel = rng.integers(0, n, pad)
        x = np.concatenate([x, x[pad_sel]])
        if sub_ids is not None:
            sub_ids = np.concatenate([sub_ids, sub_ids[pad_sel]])
    xd = _dequant_dev(jnp.asarray(x), jnp.float32(offset),
                      jnp.float32(scale))  # [N, D] f32, device-resident
    if sub_ids is not None:
        xd = xd - jnp.take(jnp.asarray(sub_cents, jnp.float32),
                           jnp.asarray(sub_ids, jnp.int32), axis=0)
    n_eff = xd.shape[0]

    books = None
    for it in range(niter):
        r_dev = jnp.asarray(r)
        y = _rotate_dev(xd, r_dev)
        books = _train_pq_device(y, m, ksub, pq_iters,
                                 np.random.default_rng(seed + 1000 * it),
                                 row_chunk=rc)
        xty, err = _opq_cross(xd, y, books, row_chunk=rc)
        # Procrustes on host: R = U Vᵀ of XᵀŶ (768×768 — negligible)
        u, s_, vt = np.linalg.svd(np.asarray(xty), full_matrices=False)
        r_new = (u @ vt).astype(np.float32)
        delta = float(np.abs(r_new - r).max())
        if verbose:
            logger.info("opq iter %d: recon_mse=%.5f dR=%.5f", it,
                        float(err) / (n_eff * d), delta)
        r = r_new

    # final PQ fit on the converged rotation
    y = _rotate_dev(xd, jnp.asarray(r))
    books = _train_pq_device(y, m, ksub, pq_iters,
                             np.random.default_rng(seed + 999), row_chunk=rc)
    return OPQ(rotation=r, pq=PQCodebook(np.asarray(books)))
