"""OPQ: learned rotation that minimizes PQ reconstruction error.

Replaces FAISS's ``OPQMatrix`` (ref: build_phrase_index.py:109-116,
OPQMatrix(d, M) with niter=10 wrapped in IndexPreTransform; applied at serve
time as ``vec · R``, ref: index.py:32,338-345).

Alternating optimization (the classic OPQ-NP algorithm):
  1. Y = X R; fit/encode PQ on Y → reconstruction Ŷ
  2. R ← Procrustes solution of min_R ||X R - Ŷ||_F over orthogonal R,
     i.e. SVD(Xᵀ Ŷ) = U Σ Vᵀ → R = U Vᵀ
PQ fit and encode run on TPU (matmul k-means); the D×D SVD runs on host —
it is a 768×768 problem, negligible.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from densephrases_tpu.ops.pq import PQCodebook, pq_decode, pq_encode, train_pq

logger = logging.getLogger(__name__)


@dataclass
class OPQ:
    rotation: np.ndarray  # [D, D] orthogonal
    pq: PQCodebook

    def apply(self, x: np.ndarray) -> np.ndarray:
        return x @ self.rotation


def train_opq(x: np.ndarray, m: int, niter: int = 10, pq_iters: int = 6,
              seed: int = 0, verbose: bool = False) -> OPQ:
    """Train rotation + codebooks (niter=10 parity with the reference's
    OPQMatrix default, build_phrase_index.py:114)."""
    n, d = x.shape
    rng = np.random.default_rng(seed)
    # init: random orthogonal rotation (FAISS inits from random rotation too)
    a = rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    r = q.astype(np.float32)

    pq = None
    for it in range(niter):
        y = x @ r
        pq = train_pq(y, m, iters=pq_iters, seed=seed + 1000 * it)
        codes = pq_encode(pq, y)
        y_hat = pq_decode(pq, codes)
        # Procrustes: R = U V^T of X^T Y_hat
        u, s, vt = np.linalg.svd(x.T @ y_hat, full_matrices=False)
        r_new = (u @ vt).astype(np.float32)
        delta = float(np.abs(r_new - r).max())
        err = float(np.mean((y - y_hat) ** 2))
        if verbose:
            logger.info("opq iter %d: recon_mse=%.5f dR=%.5f", it, err, delta)
        r = r_new

    # final PQ fit on the converged rotation
    y = x @ r
    pq = train_pq(y, m, iters=pq_iters, seed=seed + 999)
    return OPQ(rotation=r, pq=pq)
