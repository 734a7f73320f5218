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

from densephrases_tpu.ops.kmeans import _batched_lloyd_stream

_ROW_CHUNK = 4096  # rows per scanned device step in the stream kernels


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


@jax.jit
def _dequant_dev(x, offset, scale):
    """Device dequant: int8 codes → f32 rows (no-op affine for f32 input)."""
    return x.astype(jnp.float32) / scale + offset


def _mm_dtype():
    """Matmul input dtype: bf16 on TPU (MXU), f32 elsewhere — the CPU
    backend's bf16 dot-thunk coverage is incomplete for some shapes."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def _pq_assign_stream(y, books, *, row_chunk: int = _ROW_CHUNK):
    """y [N, D] device rows (N % row_chunk == 0) → PQ codes [N, M] uint8.

    Per row chunk: one batched [rc, M, dsub]×[M, K, dsub] einsum on the MXU
    + argmin over (||c||² − 2y·c). The whole encode is one dispatch."""
    n, d = y.shape
    m, k, s = books.shape
    c_sq = jnp.sum(books.astype(jnp.float32) ** 2, axis=-1)  # [M, K]
    mdt = _mm_dtype()
    b_mm = books.astype(mdt)

    def body(_, ci):
        yc = jax.lax.dynamic_slice(y, (ci * row_chunk, 0), (row_chunk, d))
        q = yc.reshape(row_chunk, m, s).astype(mdt)
        dots = jnp.einsum("cms,mks->cmk", q, b_mm,
                          preferred_element_type=jnp.float32)
        a = jnp.argmin(c_sq[None] - 2.0 * dots, axis=-1)
        return None, a.astype(jnp.uint8)

    _, out = jax.lax.scan(body, None, jnp.arange(n // row_chunk))
    return out.reshape(n, m)


@functools.partial(jax.jit,
                   static_argnames=("row_chunk", "rotate", "residual"))
def _encode_chunk(xb, rotation, books, offset, scale, cents, ids, *,
                  row_chunk: int = _ROW_CHUNK, rotate: bool = False,
                  residual: bool = False):
    """One streamed encode block: dequant (−centroid) (+rotate) +
    PQ-assign, fused. residual: subtract each row's assigned coarse
    centroid before rotating (IVF by_residual encoding)."""
    y = _dequant_dev(xb, offset, scale)
    if residual:
        y = y - jnp.take(cents, ids, axis=0)
    if rotate:
        mdt = _mm_dtype()
        y = jnp.dot(y.astype(mdt), rotation.astype(mdt),
                    preferred_element_type=jnp.float32)
    return _pq_assign_stream(y, books, row_chunk=row_chunk)


def train_pq(x: np.ndarray, m: int, nbits: int = 8, iters: int = 10,
             seed: int = 0, offset: float = 0.0, scale: float = 1.0,
             row_chunk: int = _ROW_CHUNK, sub_cents: np.ndarray = None,
             sub_ids: np.ndarray = None) -> PQCodebook:
    """Train M per-subspace codebooks (ref PQ training inside faiss,
    build_phrase_index.py:124-133).

    x: training rows — f32, or RAW int8 codes with the (offset, scale)
    dequant contract (one int8 upload; dequantization happens on device).
    sub_cents/sub_ids (optional): coarse centroids [nlist, D] f32 + each
    row's assignment [N] — train on RESIDUALS x − c (IVF by_residual),
    subtracted on device so no host f32 copy of the sample exists.
    All M sub-k-means run as ONE batched streamed Lloyd on device
    (ops/kmeans._batched_lloyd_stream): no per-subspace host loop, no
    per-subspace re-upload of the sample."""
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by M={m}"
    # 8-bit matches the reference exactly (:109-116); 4-bit is the
    # fast-scan operating point (FAISS PQx4fs role): same code bytes at
    # M×2 subspaces, 16-wide one-hot — ~8× fewer scan MACs on the MXU
    assert nbits in (4, 8), f"nbits must be 4 or 8, got {nbits}"
    dsub = d // m
    ksub = 1 << nbits
    rng = np.random.default_rng(seed)
    rc = min(row_chunk, max(256, n))
    pad = (-n) % rc
    if pad:  # resample pad rows (double weight — harmless for a quantizer)
        pad_sel = rng.integers(0, n, pad)
        x = np.concatenate([x, x[pad_sel]])
        if sub_ids is not None:
            sub_ids = np.concatenate([sub_ids, sub_ids[pad_sel]])
    y = _dequant_dev(jnp.asarray(x), jnp.float32(offset), jnp.float32(scale))
    if sub_ids is not None:
        y = y - jnp.take(jnp.asarray(sub_cents, jnp.float32),
                         jnp.asarray(sub_ids, jnp.int32), axis=0)
    books = _train_pq_device(y, m, ksub, iters, rng, row_chunk=rc)
    return PQCodebook(np.asarray(books))


def _train_pq_device(y, m: int, ksub: int, iters: int, rng,
                     row_chunk: int = _ROW_CHUNK):
    """PQ codebook fit on a DEVICE-resident [N, D] f32 matrix (N a multiple
    of row_chunk). Returns device books [M, ksub, dsub]."""
    n, d = y.shape
    dsub = d // m
    # X [M, N, dsub]: each subspace's rows, one batched Lloyd over all M
    X = jnp.moveaxis(y.reshape(n, m, dsub), 1, 0)
    # init: ksub random rows per subspace (host indices, device gather)
    idx = jnp.asarray(rng.choice(n, size=min(ksub, n), replace=False))
    C0 = jnp.take(X, idx, axis=1)  # [M, ksub, dsub]
    if C0.shape[1] < ksub:  # tiny corpora: repeat rows
        reps = -(-ksub // C0.shape[1])
        C0 = jnp.tile(C0, (1, reps, 1))[:, :ksub]
    return _batched_lloyd_stream(X, C0, iters=iters, row_chunk=row_chunk)


def pq_encode(pq: PQCodebook, x: np.ndarray, offset: float = 0.0,
              scale: float = 1.0, rotation: np.ndarray = None,
              block: int = 1 << 19, row_chunk: int = _ROW_CHUNK,
              cents: np.ndarray = None, assign: np.ndarray = None
              ) -> np.ndarray:
    """Encode rows → uint8 codes [N, M], streamed.

    x: f32 rows, or RAW int8 with the (offset, scale) contract. rotation
    (optional, [D, D]): applied on device AFTER dequant — the OPQ encode
    path. cents/assign (optional): coarse centroids + per-row assignment
    — encode RESIDUALS x − c (IVF by_residual), subtracted on device
    before the rotation. The corpus streams through the device in
    `block`-row int8/f32 chunks; at no point does an O(corpus) float (or
    rotated) copy exist on the host (the round-2 build materialized both
    — at reference scale that is terabytes; ref builds whole-corpus too:
    add_to_index ships float32 batches, build_phrase_index.py:224-227)."""
    n, d = x.shape
    books = jnp.asarray(pq.codebooks)
    rot = None if rotation is None else jnp.asarray(rotation, jnp.float32)
    resid = assign is not None
    cents_dev = (jnp.asarray(cents, jnp.float32) if resid
                 else jnp.zeros((1, 1), jnp.float32))
    out = np.empty((n, pq.m), np.uint8)
    rc = min(row_chunk, max(256, n))
    for b0 in range(0, n, block):
        xb = np.ascontiguousarray(x[b0:b0 + block])
        c = len(xb)
        pad = (-c) % rc
        if pad:
            xb = np.concatenate([xb, np.zeros((pad, d), xb.dtype)])
        if resid:
            ids = np.zeros(len(xb), np.int32)
            ids[:c] = assign[b0:b0 + c]
        else:
            ids = np.zeros(1, np.int32)
        codes = _encode_chunk(
            jnp.asarray(xb), rot if rot is not None else jnp.zeros((1, 1)),
            books, jnp.float32(offset), jnp.float32(scale),
            cents_dev, jnp.asarray(ids),
            row_chunk=rc, rotate=rot is not None, residual=resid)
        out[b0:b0 + c] = np.asarray(codes[:c])
    return out


def pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """4-bit codes [N, M] (values < 16, M even) → packed bytes [N, M//2].

    Byte i = subspace 2i (low nibble) | subspace 2i+1 << 4 (high nibble).
    The storage format for ksub=16 quantizers: same bytes/row as the
    equivalent 8-bit PQ at half the subspace width each."""
    n, m = codes.shape
    assert m % 2 == 0, f"M={m} must be even to pack nibbles"
    assert codes.dtype == np.uint8
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """Packed bytes [N, B] → 4-bit codes [N, 2B] (pack_nibbles inverse)."""
    lo = packed & 0x0F
    hi = packed >> 4
    return np.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)


def unpack_nibbles_dev(packed, m: int):
    """Device nibble unpack: [..., B(+lane pad)] uint8 → [..., M] int32
    in subspace order (low nibble first). Slices off lane padding."""
    v = packed[..., : m // 2].astype(jnp.int32)
    return jnp.stack([v & 0x0F, v >> 4], axis=-1).reshape(
        v.shape[:-1] + (m,))


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
