"""Pallas fused MIPS-scan kernel: dequant + matmul + per-chunk top-k.

Optional backend for the flat scan (index/flat.py). The pallas_call grid
walks corpus chunks; BlockSpec index_maps stream each [CHUNK, D] int8 tile
HBM→VMEM with the pipeline's automatic double buffering, the MXU computes
the [B, CHUNK] score tile, and an iterative K-selection (K passes of
max/argmax/mask on the VPU, entirely in VMEM) emits per-chunk candidates.
The exact cross-chunk merge happens outside the kernel (tiny).

Compared to the lax.scan formulation this guarantees copy/compute overlap
and never materializes score tiles in HBM. Use
``flat_scan_topk(..., interpret=True)`` on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # plain python float: jnp scalars become captured tracers
                 # inside pallas kernels


def _scan_kernel(q_ref, qsum_ref, nvalid_ref, codes_ref, vals_ref, ids_ref,
                 *, chunk: int, k: int, scale: float):
    i = pl.program_id(0)
    q = q_ref[...]  # [B, D] bf16
    codes = codes_ref[...]  # [CHUNK, D] int8
    s = jax.lax.dot_general(
        q, codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, CHUNK]
    s = s * (1.0 / scale) + qsum_ref[...][:, None]
    base = i * chunk
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    s = jnp.where(col < nvalid_ref[0], s, NEG_INF)

    # iterative K-selection in VMEM: K passes of (max, argmax, mask),
    # accumulating into registers with where-selects (Mosaic rejects
    # dynamic-column stores into the output ref)
    b = s.shape[0]
    k = vals_ref.shape[1]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def body(j, carry):
        s_cur, vals_acc, ids_acc = carry
        m = jnp.max(s_cur, axis=1)  # [B]
        am = jnp.argmax(s_cur, axis=1).astype(jnp.int32)  # [B]
        sel = col_k == j
        vals_acc = jnp.where(sel, m[:, None], vals_acc)
        ids_acc = jnp.where(sel, (am + base)[:, None], ids_acc)
        hit = jax.lax.broadcasted_iota(jnp.int32, s_cur.shape, 1) == am[:, None]
        return jnp.where(hit, NEG_INF, s_cur), vals_acc, ids_acc

    init = (s, jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.zeros((b, k), jnp.int32))
    _, vals_acc, ids_acc = jax.lax.fori_loop(0, k, body, init)
    vals_ref[...] = vals_acc
    ids_ref[...] = ids_acc


@functools.partial(jax.jit,
                   static_argnames=("top_k", "chunk", "interpret",
                                    "offset", "scale"))
def flat_scan_topk(queries, codes, n_valid, offset: float, scale: float,
                   *, top_k: int, chunk: int = 4096,
                   interpret: bool = False):
    """queries [B, D] f32; codes [R, D] int8, R % chunk == 0.
    Returns (vals [B, K], ids [B, K] int32) — exact merge over per-chunk
    candidates."""
    b, d = queries.shape
    r = codes.shape[0]
    n_chunks = r // chunk
    k = min(top_k, chunk)
    qbf = queries.astype(jnp.bfloat16)
    qsum = (queries.sum(-1) * offset).astype(jnp.float32)
    nvalid = jnp.full((1,), n_valid, jnp.int32)

    kernel = functools.partial(_scan_kernel, chunk=chunk, k=k,
                               scale=float(scale))
    vals, ids = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * b, k), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * b, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * d,
            bytes_accessed=r * d + b * d * 4 + n_chunks * b * k * 8,
            transcendentals=0,
        ),
    )(qbf, qsum, nvalid, codes)

    # exact merge: [n_chunks*B, K] → [B, n_chunks*K] → top_k
    vals = vals.reshape(n_chunks, b, k).transpose(1, 0, 2).reshape(b, -1)
    ids = ids.reshape(n_chunks, b, k).transpose(1, 0, 2).reshape(b, -1)
    out_v, pos = jax.lax.top_k(vals, top_k)
    out_i = jnp.take_along_axis(ids, pos, axis=1)
    return out_v, out_i


# ---------------------------------------------------------------------------
# Two-phase scan: the selection-free formulation.
#
# The single-kernel scan above spends O(K · B · R) VPU work on its iterative
# K-selection — at R = 10^6+ that dominates the bandwidth-bound matmul and
# loses to XLA. The two-phase version keeps the kernel selection-free:
#
#   phase 1 (Pallas): stream the corpus once, MXU matmul, ONE reduction pass
#     emitting per-SUB-row-subtile maxima [B, R/SUB] — nothing else. This is
#     the whole corpus read at speed-of-light: no score tile, no K loop.
#   phase 2 (XLA):   top-M subtile maxima per query (M = m_factor·K), gather
#     those M code blocks ([B, M, SUB, D] int8 — tiny), rescore exactly,
#     top-k over the M·SUB candidates.
#
# Exactness: let τ be the (M+1)-th largest subtile max. Every *excluded*
# subtile has max ≤ τ, so if the returned k-th score ≥ τ, no excluded row
# can enter the top-k — the result is provably exact. The returned `ok`
# mask reports this per query; on real (even mildly concentrated) data it
# holds at m_factor=4. Callers wanting a hard guarantee re-run with a
# larger m_factor on ok=False (FlatIndex does not by default: checking
# costs a device sync, and tests pin ok=True on representative data).
# ---------------------------------------------------------------------------


def _submax_kernel(q_ref, qsum_ref, nvalid_ref, codes_ref, submax_ref,
                   *, chunk: int, sub: int, scale: float):
    i = pl.program_id(0)
    q = q_ref[...]  # [B, D] bf16
    codes = codes_ref[...]  # [CHUNK, D] int8
    s = jax.lax.dot_general(
        q, codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, CHUNK]
    s = s * (1.0 / scale) + qsum_ref[...][:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * chunk
    s = jnp.where(col < nvalid_ref[0], s, NEG_INF)
    b = s.shape[0]
    submax_ref[0] = jnp.max(s.reshape(b, chunk // sub, sub), axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "chunk", "sub", "m_factor",
                                    "interpret", "offset", "scale"))
def flat_scan_topk2(queries, codes, n_valid, offset: float, scale: float,
                    *, top_k: int, chunk: int = 32768, sub: int = 128,
                    m_factor: int = 4, interpret: bool = False):
    """Two-phase exact MIPS top-k. queries [B, D] f32; codes [R, D] int8,
    R % chunk == 0, chunk % sub == 0. Returns (vals [B, K], ids [B, K] i32,
    ok [B] bool) — ok certifies per-query exactness (see module notes)."""
    b, d = queries.shape
    r = codes.shape[0]
    n_chunks = r // chunk
    nsub_total = r // sub
    qbf = queries.astype(jnp.bfloat16)
    qsum = (queries.sum(-1) * offset).astype(jnp.float32)
    nvalid = jnp.full((1,), n_valid, jnp.int32)

    kernel = functools.partial(_submax_kernel, chunk=chunk, sub=sub,
                               scale=float(scale))
    submax = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # 3D output [n_chunks, B, chunk/sub]: Mosaic requires the block's
        # minor dim be 128-divisible OR equal to the array's — (1, B, c/s)
        # against [n_chunks, B, c/s] satisfies the latter
        out_specs=pl.BlockSpec((1, b, chunk // sub), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, b, chunk // sub),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * d,
            bytes_accessed=r * d + b * d * 4 + b * nsub_total * 4,
            transcendentals=0,
        ),
    )(qbf, qsum, nvalid, codes)
    submax = submax.transpose(1, 0, 2).reshape(b, nsub_total)

    # ---- phase 2: rescore the top-M subtiles exactly (plain XLA: the
    # gather is B·M·SUB rows — microscopic next to the phase-1 stream)
    m = min(m_factor * top_k, nsub_total)
    _, sub_ids = jax.lax.top_k(submax, m)  # [B, M]
    blocks = codes.reshape(nsub_total, sub, d)[sub_ids]  # [B, M, SUB, D] i8
    s = jnp.einsum("bmsd,bd->bms", blocks.astype(jnp.bfloat16), qbf,
                   preferred_element_type=jnp.float32)
    s = s * (1.0 / float(scale)) + qsum[:, None, None]
    rows = sub_ids[..., None] * sub + jnp.arange(sub)  # [B, M, SUB]
    s = jnp.where(rows < n_valid, s, NEG_INF)
    out_v, pos = jax.lax.top_k(s.reshape(b, m * sub), top_k)
    out_i = jnp.take_along_axis(rows.reshape(b, m * sub), pos, axis=1)

    if m < nsub_total:
        # τ = (M+1)-th largest subtile max bounds every excluded subtile's
        # elements from above ⇒ exact iff the returned k-th score ≥ τ
        tau = jax.lax.top_k(submax, m + 1)[0][:, -1]
        ok = out_v[:, -1] >= tau
    else:
        ok = jnp.ones((b,), bool)
    return out_v, out_i.astype(jnp.int32), ok
