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
