"""Attention for the BERT towers.

Two interchangeable implementations of bidirectional multi-head attention with
a padding mask:

- ``attention_xla``: plain jnp einsum formulation; XLA fuses it well and it is
  differentiable — used for training.
- ``attention_pallas``: a fused Pallas TPU kernel that keeps the whole
  [L, L] score matrix in VMEM per (batch, head) grid cell, so scores are never
  materialized in HBM. For the 512-token windows this framework uses
  (ref striding design: densephrases/options.py:36-37, Makefile:143-144),
  L·L·4B = 1 MB — far under the ~16 MB VMEM budget, so no K/V tiling pass is
  needed; this *is* the speed-of-light schedule for this shape.

``attention(...)`` auto-selects: Pallas on TPU, XLA elsewhere. Both the
forward and the backward are fused Pallas kernels on TPU: the backward
recomputes the score matrix in VMEM from (q, k, v, mask) residuals
(flash-attention style), so no [L, L] tensor ever lands in HBM in either
direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def attention_xla(q, k, v, mask):
    """Reference attention. q,k,v: [B, H, L, D]; mask: [B, L] (1=keep)."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
    scores = scores.astype(jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fused_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch, head) cell: full L×L attention in VMEM, fp32 softmax."""
    q = q_ref[0].astype(jnp.float32)  # [L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
        1.0 / (d ** 0.5)
    )  # [L, L]
    bias = (1.0 - mask_ref[0, 0].astype(jnp.float32)) * NEG_INF  # [L]
    scores = scores + bias[None, :]
    # Numerically stable softmax on the VPU.
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_pallas(q, k, v, mask, interpret: bool = False):
    """Fused attention kernel. q,k,v: [B, H, L, D]; mask: [B, L]."""
    b, h, l, d = q.shape
    qf = q.reshape(b * h, l, d)
    kf = k.reshape(b * h, l, d)
    vf = v.reshape(b * h, l, d)
    # [B*H, 1, L]: keep the last two block dims (1, L) Mosaic-tileable.
    maskf = jnp.repeat(mask.astype(jnp.float32), h, axis=0)[:, None, :]

    out = pl.pallas_call(
        _fused_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * l * l * d,
            bytes_accessed=(3 * l * d + l * d + l) * 4,
            transcendentals=l * l,
        ),
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, l, d)


def _fused_attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                           dq_ref, dk_ref, dv_ref):
    """Backward for one (batch, head) cell, scores recomputed in VMEM.

    Residuals are just (q, k, v, mask): the [L, L] probability matrix is
    recomputed here (flash-attention style) instead of being saved to HBM,
    so training keeps the same O(L·D) memory footprint as the forward.

        dv = Pᵀ g
        dS = P ∘ (dP − rowsum(dP ∘ P)),  dP = g vᵀ
        dq = dS k / √d,  dk = dSᵀ q / √d
    """
    q = q_ref[0].astype(jnp.float32)  # [L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    inv_sqrt_d = 1.0 / (d ** 0.5)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * inv_sqrt_d
    bias = (1.0 - mask_ref[0, 0].astype(jnp.float32)) * NEG_INF  # [L]
    scores = scores + bias[None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [L, L]
    dv = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * inv_sqrt_d
    dq_ref[0] = jnp.dot(
        ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jnp.dot(
        ds.T, q, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_pallas_bwd(q, k, v, mask, g, interpret: bool = False):
    """Fused backward: (dq, dk, dv), each [B, H, L, D]."""
    b, h, l, d = q.shape
    flat = lambda x: x.reshape(b * h, l, d)
    maskf = jnp.repeat(mask.astype(jnp.float32), h, axis=0)[:, None, :]
    spec3 = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fused_attn_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), q.dtype)] * 3,
        grid=(b * h,),
        in_specs=[
            spec3, spec3, spec3,
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec3,
        ],
        out_specs=[spec3] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * l * l * d,
            bytes_accessed=(7 * l * d + l) * 4,
            transcendentals=l * l,
        ),
    )(flat(q), flat(k), flat(v), maskf, flat(g))
    dq, dk, dv = (x.reshape(b, h, l, d) for x in out)
    return dq, dk, dv


@jax.custom_vjp
def _attention_pallas_ad(q, k, v, mask):
    return attention_pallas(q, k, v, mask)


def _attention_pallas_fwd(q, k, v, mask):
    return attention_pallas(q, k, v, mask), (q, k, v, mask)


def _attention_pallas_bwd(res, g):
    q, k, v, mask = res
    dq, dk, dv = attention_pallas_bwd(q, k, v, mask, g)
    return dq, dk, dv, None


_attention_pallas_ad.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


# Below this sequence length the fused kernel's one-(batch,head)-per-grid-
# cell schedule is launch/DMA-bound (L=32 queries: B·H ≈ 1500 cells of
# ~0.26 MFLOP each) and XLA's batched-GEMM formulation wins by a wide
# margin; at the 512-token dump/train windows the VMEM-resident kernel
# wins. Crossover measured on the axon v4 chip (docs/DEVICE_BENCH.json
# encode_b64_ms: 22.7 ms pallas → ~3 ms xla at L=32).
PALLAS_MIN_SEQ = 128


def attention(q, k, v, mask, impl: str = "auto", interpret: bool = False):
    """Dispatch: 'pallas' | 'xla' | 'auto' (pallas on TPU for long
    sequences, xla otherwise). The pallas path is differentiable via a
    custom VJP (fused Pallas backward)."""
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and q.shape[2] >= PALLAS_MIN_SEQ else "xla")
    if impl == "pallas":
        if interpret:
            return attention_pallas(q, k, v, mask, interpret=True)
        return _attention_pallas_ad(q, k, v, mask)
    return attention_xla(q, k, v, mask)


def attention_vjp_pallas(q, k, v, mask, g, interpret: bool = False):
    """Direct entry to the fused backward kernel (used by tests)."""
    return attention_pallas_bwd(q, k, v, mask, g, interpret=interpret)
