"""Product quantization: codebook training, encode/decode, MXU LUT scan.

Replaces FAISS's PQ (ref: build_phrase_index.py:109-116 IndexIVFPQ(nc, 96,
8-bit)): M subspaces × 256 centroids, one uint8 code per subspace.

TPU-native scan design: per-query score tables LUT[b, m, k] = q_sub[b,m]·C[m,k]
are computed by one matmul; candidate scores are then
``score[b, c] = Σ_m LUT[b, m, code[c, m]]`` — instead of a gather (bad on
TPU), the codes are expanded to a one-hot [C, M*256] bf16 matrix and the scan
is a single [B, M*256] × [M*256, C] matmul on the MXU. Code→one-hot expansion
is pure VPU compare work; no gathers anywhere in the hot loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.ops.kmeans import kmeans, kmeans_assign


@dataclass
class PQCodebook:
    """codebooks: [M, 256, dsub] float32."""

    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def train_pq(x: np.ndarray, m: int, nbits: int = 8, iters: int = 10,
             seed: int = 0) -> PQCodebook:
    """Train M per-subspace codebooks with k-means (ref PQ training inside
    faiss, build_phrase_index.py:124-133)."""
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by M={m}"
    assert nbits == 8, "only 8-bit PQ supported (ref uses 8, :109-116)"
    dsub = d // m
    ksub = 1 << nbits
    books = np.zeros((m, ksub, dsub), np.float32)
    for mi in range(m):
        sub = np.ascontiguousarray(x[:, mi * dsub:(mi + 1) * dsub])
        books[mi], _ = kmeans(sub, ksub, iters=iters, seed=seed + mi,
                              chunk=min(4096, max(256, n // 4 // 256 * 256) or 256))
    return PQCodebook(books)


def pq_encode(pq: PQCodebook, x: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Encode rows → uint8 codes [N, M]."""
    n, d = x.shape
    m, dsub = pq.m, pq.dsub
    codes = np.zeros((n, m), np.uint8)
    for mi in range(m):
        sub = jnp.asarray(x[:, mi * dsub:(mi + 1) * dsub], jnp.float32)
        a = kmeans_assign(sub, jnp.asarray(pq.codebooks[mi]),
                          chunk=min(chunk, max(256, n)))
        codes[:, mi] = np.asarray(a).astype(np.uint8)
    return codes


def pq_decode(pq: PQCodebook, codes: np.ndarray) -> np.ndarray:
    """Decode codes → approximate vectors [N, D] (host path, offline use)."""
    n, m = codes.shape
    out = np.zeros((n, pq.dim), np.float32)
    dsub = pq.dsub
    for mi in range(m):
        out[:, mi * dsub:(mi + 1) * dsub] = pq.codebooks[mi][codes[:, mi]]
    return out


@jax.jit
def pq_lut(codebooks, queries):
    """Per-query inner-product tables: LUT[b, m, k] = q[b, sub m] · C[m, k].

    codebooks: [M, K, dsub]; queries: [B, D]. Returns [B, M, K] f32.
    """
    b, d = queries.shape
    m, k, dsub = codebooks.shape
    q = queries.reshape(b, m, dsub)
    return jnp.einsum("bms,mks->bmk", q.astype(jnp.bfloat16),
                      codebooks.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def codes_to_onehot(codes, ksub: int = 256):
    """codes [C, M] int → one-hot [C, M*ksub] bf16 (VPU compare, no gather)."""
    c, m = codes.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, m, ksub), 2)
    onehot = (codes[..., None].astype(jnp.int32) == iota)
    return onehot.reshape(c, m * ksub).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_scores_scan(lut, codes, *, chunk: int = 1024):
    """Score all candidates: [B, C] = Σ_m LUT[b, m, code[c, m]].

    lut: [B, M, K]; codes: [C, M] uint8 with C % chunk == 0.
    Implemented as a scan of one-hot matmuls on the MXU.
    """
    b, m, k = lut.shape
    flat_lut = lut.reshape(b, m * k).astype(jnp.bfloat16)
    c_total = codes.shape[0]

    def body(_, code_chunk):
        oh = codes_to_onehot(code_chunk, k)  # [chunk, M*K]
        s = jax.lax.dot_general(
            flat_lut, oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, chunk]
        return None, s

    _, out = jax.lax.scan(body, None, codes.reshape(-1, chunk, m))
    return jnp.moveaxis(out, 0, 1).reshape(b, c_total)
