"""Exact-length IVF list scan: scalar-prefetch Pallas pack+score kernel.

The grouped union scan (index/ivf.py:_union_scan) reads every probed list
through a fixed-size dynamic_slice of CAP rows (CAP = longest list). After
balance/force-partition the cap/mean ratio is ~4.6 (10.5M measurement:
cap 480, mean 105), so ~78% of the scan's HBM traffic is padding.

This module removes that read amplification with a Pallas kernel driven by
scalar-prefetched *block* indices:

- Probed lists are deduped on device (sort + sentinel, as in the grouped
  scan), then flattened into a sequence of 32-row BLOCKS covering exactly
  [align32(offs), align32(offs+len)) of each unique list — i.e. each
  list's true extent rounded to the int8 tile sublane, not CAP.
- The kernel's input BlockSpec index_map reads the prefetched block table:
  grid step (t, b) DMAs codes block ``blk[t*TPB+b]`` (32 rows) into a
  VMEM tile; every TPB-th step scores the assembled [256, D] tile against
  the VMEM-resident query batch with ONE MXU matmul. Pallas double-buffers
  the 32-row DMAs across grid steps automatically.
- The block budget is STATIC but TIERED: the scan is compiled at a small
  budget sized from the corpus's mean blocks-per-list (x a safety factor)
  AND at the worst case (sum of the U longest lists' block counts,
  U = B*nprobe); a ``lax.cond`` on the batch's ACTUAL block total picks
  the branch at run time, so the common case pays the small budget and
  correctness never depends on the estimate. Unused budget slots all map
  to the same trailing pad block — Pallas skips the re-DMA when
  consecutive steps map to the same block, and the kernel predicates off
  BOTH the tile copy and the score matmul for all-junk tiles, so junk
  slots cost a grid step, not bandwidth or MXU time.

Semantics vs the grouped scan: the packed scan scores every query against
the UNION of the batch's probed lists (no per-query membership mask) and
against up-to-31 edge rows of lists adjacent to a probed list (block
alignment). Both only ADD true-scored candidates — recall is ≥ the
masked per-query scan's — and candidate ids remain exact. FAISS-parity
per-query-nprobe masking is available in the grouped fallback.

Disjoint coverage: consecutive probed lists can share a boundary block
(list i's extent ends and list i+1's begins inside the same 32-row
block). Block starts are therefore adjusted to ``max(b0_i, e_{i-1})``
(e = exclusive end block of the previous unique list), which provably
keeps coverage BOTH disjoint (no row scored twice → no duplicate ids in
top-k) and complete: lists are disjoint sorted row ranges, so
``e_{i-1} <= b0_i + 1``, and the at-most-one skipped block ``b0_i`` lies
in ``[b0_{i-1}, e_{i-1})`` — already covered (induction over i). With
nprobe = nlist this makes the scan EXACTLY equal to a flat scan over the
quantized codes.

Ref role: this replaces the FAISS inverted-list scan loop
(/root/reference/densephrases/index.py:189-202 search_dense → faiss
IVF scan) for the SQ8/SQ4 fine-quant paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.float32(-1e30)

RB = 32          # rows per DMA block (int8 min tile sublane)
TPB = 8          # blocks per scored tile
TILE = RB * TPB  # rows per MXU matmul


def _overflow_warn(total, guard: int, name: str):
    """Debug-print when a batch's block total exceeds the guard tier
    (silent truncation otherwise). jax.debug.print lowers to a host
    callback, which some TPU transports (axon_pjrt) cannot execute —
    there the guard-tier overflow stays silent unless DPH_TPU_CALLBACKS=1
    opts in (real TPU runtimes support callbacks)."""
    import os

    if (jax.default_backend() == "tpu"
            and os.environ.get("DPH_TPU_CALLBACKS", "0") != "1"):
        return
    jax.lax.cond(
        total > guard,
        lambda t: jax.debug.print(
            name + ": block total {} exceeds guard tier "
            + str(guard) + " -- candidate coverage truncated", t),
        lambda t: None, total)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_score_kernel(blk_ref, q_ref, codes_ref, out_ref, tile_ref, *,
                       sq4: bool, pad_blk: int):
    """Grid (T_tiles, TPB). Copies one 32-row code block per step into the
    persistent VMEM tile; on the tile's last block, scores the whole tile
    against the resident query batch (one [B,D]x[D,TILE] MXU matmul).

    Junk slots (block table entries == pad_blk; always a table SUFFIX)
    are predicated off entirely: no tile copy, and tiles whose FIRST slot
    is junk skip the matmul. Stale tile rows scored by partially-junk
    tiles are masked downstream by the caller's validity mask."""
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(blk_ref[t * TPB + b] != pad_blk)
    def _():
        tile_ref[pl.ds(b * RB, RB), :] = codes_ref[:]

    @pl.when((b == TPB - 1) & (blk_ref[t * TPB] != pad_blk))
    def _():
        if sq4:
            # packed nibbles -> [TILE, D] raw codes (int4 affine contract:
            # high nibble = first half of the feature dim, ops/quant.py)
            v = tile_ref[:].astype(jnp.int32) & 0xFF
            t8 = jnp.concatenate([v >> 4, v & 0xF], axis=1).astype(jnp.bfloat16)
        else:
            t8 = tile_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            q_ref[:], t8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _pack_score(q_bf, codes, blk, *, budget: int, sq4: bool,
                interpret: bool = False):
    """q_bf [B_pad, D] bf16, codes [N_pad, Dc] int8 (N_pad % 32 == 0),
    blk [budget] int32 block table → raw scores [B_pad, budget*RB] f32."""
    bp, d = q_bf.shape
    n_tiles = budget // TPB
    dc = codes.shape[1]

    pad_blk = codes.shape[0] // RB - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, TPB),
        in_specs=[
            pl.BlockSpec((bp, d), lambda t, b, blk_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, dc),
                         lambda t, b, blk_ref: (blk_ref[t * TPB + b], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, TILE), lambda t, b, blk_ref: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, dc), jnp.int8)],
    )
    return pl.pallas_call(
        functools.partial(_pack_score_kernel, sq4=sq4, pad_blk=pad_blk),
        out_shape=jax.ShapeDtypeStruct((bp, n_tiles * TILE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(blk, q_bf, codes)


def _topk2(s, k: int):
    """Exact two-stage top-k over wide score rows.

    One monolithic lax.top_k over 10^5+ columns is the scan's hidden
    serial cost at large budgets; per-segment top-k followed by a top-k
    over the per-segment winners is exact (the global top-k is contained
    in the union of per-segment top-k's whenever k <= segment width) and
    keeps each sort small. s columns must be a multiple of SEG when wide
    (the caller rounds budgets to SEG // RB blocks)."""
    b, c = s.shape
    seg = 2048
    if c <= 2 * seg or c % seg:
        return jax.lax.top_k(s, min(k, c))
    nseg = c // seg
    kk = min(k, seg)
    v1, p1 = jax.lax.top_k(s.reshape(b, nseg, seg), kk)
    base = (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :, None]
    idx1 = (p1 + base).reshape(b, nseg * kk)
    v, p = jax.lax.top_k(v1.reshape(b, nseg * kk), min(k, nseg * kk))
    return v, jnp.take_along_axis(idx1, p, axis=1)


@functools.partial(
    jax.jit, static_argnames=("top_k", "nprobe", "cap", "budgets", "n_real",
                              "sq4", "interpret", "exact_topk"))
def packed_union_scan(q_raw, centroids, list_offsets, codes, row_perm,
                      offset, scale, nlist_valid=None, q_score=None, *,
                      top_k: int, nprobe: int, cap: int, budgets,
                      n_real: int, sq4: bool = False,
                      interpret: bool = False, exact_topk: bool = True):
    """One-dispatch IVF search with exact-length list reads.

    q_raw [B, D] f32; codes [N_pad, Dc] int8 sorted by list, N_pad % 32 == 0
    with >= RB trailing pad rows; budgets: ascending tuple of static block
    budgets — the LAST must be a safe worst case (IVFIndex uses the
    pack_budget_table sum, which never overflows); earlier tiers are
    cheap-case estimates selected by a lax.cond on the batch's actual
    block total. offset/scale: the affine contract of the STORED codes
    (int8 contract for SQ8, int4 contract for SQ4). q_score (optional):
    scoring-space queries when they differ from the probe-space ones —
    the trained per-dim int4 contract pre-divides queries by the scale
    vector and passes ``offset`` as the matching per-dim bias vector
    (scale then 1.0); probing always uses the TRUE q_raw.
    Returns (vals [B,K] f32, gids [B,K]).
    """
    if isinstance(budgets, int):
        budgets = (budgets,)
    if q_score is None:
        q_score = q_raw
    b, d = q_raw.shape
    nlist = centroids.shape[0]

    # ---- probe (max inner product over centroids, ref: index.py:53,62)
    c_scores = jnp.einsum("bd,nd->bn", q_raw.astype(jnp.bfloat16),
                          centroids.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if nlist_valid is not None:
        c_scores = jnp.where(
            jnp.arange(nlist)[None, :] < nlist_valid, c_scores, NEG_INF)
    _, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, P]

    # ---- dedup probed lists on device (sentinel sorts last)
    flat = jnp.sort(probe_ids.reshape(-1))
    keep = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uniq = jnp.sort(jnp.where(keep, flat, nlist))  # [U]
    u_n = uniq.shape[0]
    valid_l = uniq < nlist
    lic = jnp.minimum(uniq, nlist - 1).astype(jnp.int32)
    offs = list_offsets[lic]
    lens = jnp.where(valid_l,
                     jnp.minimum(list_offsets[lic + 1] - offs, cap), 0)

    # ---- flatten to a 32-row block table (exact extents, 32-aligned,
    # starts adjusted so consecutive lists' coverage is disjoint — see
    # "Disjoint coverage" in the module docstring)
    pad_blk = codes.shape[0] // RB - 1  # all-pad trailing block
    b0 = offs // RB
    e = (offs + lens + RB - 1) // RB  # exclusive end block, non-decreasing
    start = jnp.maximum(b0, jnp.concatenate(
        [jnp.zeros((1,), e.dtype), e[:-1]]))
    bc = jnp.where(valid_l, jnp.maximum(e - start, 0), 0)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bc).astype(jnp.int32)])
    total = cum[u_n]
    # the guard tier may be SMEM-clamped below the true worst case
    # (IVFIndex._pack_budgets); when a batch actually exceeds it, coverage
    # truncates — make that observable instead of silent
    _overflow_warn(total, budgets[-1], "packed_union_scan")

    bp = _round_up(max(b, 16), 16)  # bf16 sublane tile
    q_bf = jnp.zeros((bp, d), jnp.bfloat16).at[:b].set(
        q_score.astype(jnp.bfloat16))
    # offset may be a per-dim vector (trained int4 ranges); reduces to
    # q.sum * offset for scalars
    qsum = (q_score * offset).sum(-1)

    def scan_at(budget: int):
        """Pack + score + top-k at one static block budget."""
        def run(_):
            j = jnp.arange(budget, dtype=jnp.int32)
            u_of = jnp.clip(
                jnp.searchsorted(cum, j, side="right") - 1, 0, u_n - 1)
            blk = jnp.where(j < total, start[u_of] + (j - cum[u_of]),
                            pad_blk).astype(jnp.int32)
            raw = _pack_score(q_bf, codes, blk, budget=budget, sq4=sq4,
                              interpret=interpret)[:b]  # [B, budget*RB]
            # affine correction + validity mask + top-k
            r = jnp.arange(budget * RB, dtype=jnp.int32)
            src = blk[r // RB] * RB + (r % RB)  # packed row -> sorted row
            valid = ((r // RB) < total) & (src < n_real)
            s = jnp.where(valid[None, :], raw / scale + qsum[:, None],
                          NEG_INF)
            k = min(top_k, s.shape[1])
            if exact_topk:
                vals, pos = _topk2(s, k)
            else:
                vals, pos = jax.lax.approx_max_k(s, k, recall_target=0.98)
            rows = jnp.take(src, pos)
            gids = row_perm[jnp.clip(rows, 0, row_perm.shape[0] - 1)]
            # tiers must agree on output width: the largest tier's k is
            # min(top_k, last_budget * RB) — pad smaller tiers up to it
            k_out = min(top_k, budgets[-1] * RB)
            if k < k_out:
                vals = jnp.concatenate(
                    [vals, jnp.full((b, k_out - k), NEG_INF)], axis=1)
                gids = jnp.concatenate(
                    [gids, jnp.zeros((b, k_out - k), gids.dtype)], axis=1)
            return vals, gids
        return run

    # cond ladder, smallest sufficient tier first; the last tier is the
    # worst case and needs no guard. Every tier is compiled; only the
    # selected one executes at run time.
    run = scan_at(budgets[-1])
    for small in reversed(budgets[:-1]):
        def run(_, small=small, big=run):
            return jax.lax.cond(total <= small, scan_at(small), big, None)
    return run(None)


def pack_budget_table(list_offsets: np.ndarray, cap: int) -> np.ndarray:
    """Descending cumulative block counts: budget for U unique lists =
    table[min(U, nlist) - 1] (the exact worst case — the U longest lists,
    block counts including the up-to-1 alignment block)."""
    offs = np.asarray(list_offsets, np.int64)
    lens = np.minimum(np.diff(offs), cap)
    nblk = (offs[:-1] + lens + RB - 1) // RB - offs[:-1] // RB
    nblk = np.sort(nblk)[::-1]
    return np.cumsum(nblk)


# --------------------------------------------------------------------------
# PQ/OPQ packed scan: the same exact-length block geometry, but the tile
# score is a one-hot LUT contraction built INSIDE the kernel.
#
# The pure-XLA PQ block scan (index/ivf.py:_pq_block_scan) materializes a
# [chunk, M*256] bf16 one-hot in HBM per chunk (100 MB at chunk 2048 /
# OPQ96) and walks ~100+ serial lax.scan steps of gather → expand → matmul
# → top-k; measured 183.8 ms amortized b64 at 10.5M (docs/IVF_SCALE.json
# r4) against an ~8 ms MXU floor — the scan is dispatch/HBM-bound, not
# FLOP-bound. This kernel keeps the whole contraction on-chip:
#
# - the per-query LUT ([B, M*256] bf16, 6.3 MB at B=128/OPQ96) is VMEM-
#   resident across the entire grid (constant index_map → one DMA);
# - 32-row code blocks stream HBM→VMEM by scalar-prefetched block table
#   (double-buffered by Pallas), 128 B/row — the exact-length read;
# - per 256-row tile, the one-hot is built in VMEM in M-groups of 16
#   subspaces ([256, 4096] bf16, 2 MB — never touches HBM) and contracted
#   on the MXU against the matching LUT slice, f32-accumulated.
#
# Ref role: the FAISS IVFPQ ADC scan (/root/reference/densephrases/
# index.py:189-202; IndexIVFPQ in build_phrase_index.py:109-116).
# --------------------------------------------------------------------------

PQ_MG = 16  # max subspaces per one-hot group (group width = 16*256 = 4096)


def _pq_group(m: int) -> int:
    """Largest one-hot group width that divides M (bounds the VMEM
    expansion to [TILE, mg*256] bf16 = 2 MB at mg=16)."""
    for mg in (16, 8, 4, 2, 1):
        if m % mg == 0:
            return mg
    return 1


def _pq_pack_score_kernel(blk_ref, lut_ref, codes_ref, out_ref, tile_ref, *,
                          m: int, mg: int, tpb: int, pad_blk: int,
                          ksub: int = 256):
    """Grid (T_tiles, tpb). Copies one 32-row code block per step into the
    persistent VMEM tile; on the tile's last block, scores the tile against
    the VMEM-resident LUT with M//mg one-hot MXU contractions.

    ksub=16 (4-bit books): codes are NIBBLE-PACKED — M//2 bytes per row,
    byte i = subspace 2i | subspace 2i+1 << 4 (ops/pq.pack_nibbles). The
    kernel unpacks in VMEM (int32 mask/shift) and scores with TWO
    16-wide one-hot contractions (lo then hi nibbles) — the one-hot is
    M*16 wide instead of M/2*256: ~8× fewer build elements and MACs for
    the same code bytes (the FAISS PQx4 fast-scan role).

    Junk slots (pad_blk suffix) skip the copy; all-junk tiles skip the
    matmul (stale rows are masked downstream by the caller)."""
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(blk_ref[t * tpb + b] != pad_blk)
    def _():
        tile_ref[pl.ds(b * RB, RB), :] = codes_ref[:]

    @pl.when((b == tpb - 1) & (blk_ref[t * tpb] != pad_blk))
    def _():
        import os

        rows = tile_ref.shape[0]
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        if ksub == 16:
            nbytes = m // 2
            sub = tile_ref[:, :nbytes].astype(jnp.int32)  # packed bytes
            kpat = jax.lax.broadcasted_iota(
                jnp.int32, (1, nbytes * 16), 1) // nbytes
            for h, nib in enumerate((sub & 0x0F, sub >> 4)):
                rep = pltpu.repeat(nib, 16, axis=1)  # [rows, nbytes*16]
                oh = (rep == kpat).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    lut_ref[:, h * nbytes * 16:(h + 1) * nbytes * 16], oh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = acc
            return
        oh_mode = os.environ.get("DPH_PQ_OH", "repeat")
        iota3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
        # k pattern for the 2D repeat one-hot: pltpu.repeat is a TILE
        # repeat (col j of a group = sub[:, j % mg]), so col j covers
        # (subspace j % mg, code j // mg) — the caller permutes the LUT
        # into the same k-major-within-group layout
        for g in range(m // mg):
            if oh_mode == "repeat8":
                # EXPERIMENTAL uint8 repeat + compare (2.5x less VMEM
                # traffic than int32 in principle) — Mosaic REJECTS this
                # lowering on real v5e (compile-helper exit 1, measured
                # 2026-08-19, docs/IVF_SCALE.json pq_kernel_sweep);
                # interpret mode accepts it. Kept for future toolchains;
                # NOT the default.
                sub8 = tile_ref[:, g * mg:(g + 1) * mg]  # uint8 codes
                rep = pltpu.repeat(sub8, 256, axis=1)    # [rows, mg*256]
                kpat8 = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, mg * 256), 1) // mg).astype(jnp.uint8)
                oh = (rep == kpat8).astype(jnp.bfloat16)
            elif oh_mode == "repeat":
                # int32 tile-repeat + compare — no 3D->2D reshape
                # relayout on the [rows, mg*256] bf16 tensor
                sub = tile_ref[:, g * mg:(g + 1) * mg].astype(jnp.int32)
                kpat = jax.lax.broadcasted_iota(
                    jnp.int32, (1, mg * 256), 1) // mg
                rep = pltpu.repeat(sub, 256, axis=1)  # [rows, mg*256]
                oh = (rep == kpat).astype(jnp.bfloat16)
            else:
                # int32 minor-dim insert (Mosaic supports it for 32-bit
                # only) + merge reshape — the fallback formulation
                sub = tile_ref[:, g * mg:(g + 1) * mg].astype(jnp.int32)
                oh = (sub[..., None] == iota3).astype(
                    jnp.bfloat16).reshape(rows, mg * 256)
            acc = acc + jax.lax.dot_general(
                lut_ref[:, g * mg * 256:(g + 1) * mg * 256], oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc


def _pq_tpb() -> int:
    """Blocks per scored PQ tile (tile rows = 32*tpb). Deeper tiles mean
    fewer grid steps and fatter MXU matmuls at more VMEM."""
    import os

    return max(1, int(os.environ.get("DPH_PQ_TPB", "8")))


def _pq_pack_score(lut_bf, codes128, blk, *, budget: int, m: int,
                   ksub: int = 256, interpret: bool = False):
    """lut_bf [B_pad, M*ksub] bf16, codes128 [N_pad, 128] uint8 lane-padded
    codes (N_pad % 32 == 0; nibble-packed M//2 bytes/row when ksub=16),
    blk [budget] int32 block table → raw LUT scores [B_pad, budget*RB] f32."""
    import os

    bp = lut_bf.shape[0]
    tpb = _pq_tpb()
    while budget % tpb:
        tpb //= 2
    tile = RB * tpb
    n_tiles = budget // tpb
    lanes = codes128.shape[1]
    pad_blk = codes128.shape[0] // RB - 1
    mg = _pq_group(m)
    if ksub == 16:
        # permute the LUT into the two-contraction layout the 4-bit
        # kernel consumes: [lo-nibble subspaces k-major | hi-nibble
        # subspaces k-major] — half h, col j <-> LUT[:, 2*(j % M//2) + h,
        # j // (M//2)] (pack order: ops/pq.pack_nibbles)
        nbytes = m // 2
        l3 = lut_bf.reshape(bp, m, 16)
        lut_bf = jnp.concatenate(
            [l3[:, 0::2, :].swapaxes(1, 2).reshape(bp, nbytes * 16),
             l3[:, 1::2, :].swapaxes(1, 2).reshape(bp, nbytes * 16)],
            axis=1)
    elif os.environ.get("DPH_PQ_OH", "repeat").startswith("repeat"):
        # permute the LUT into the repeat one-hot's k-major-within-group
        # layout: group g, col j <-> LUT[:, g*mg + j % mg, j // mg]
        lut_bf = lut_bf.reshape(bp, m // mg, mg, 256).swapaxes(
            2, 3).reshape(bp, m * 256)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, tpb),
        in_specs=[
            pl.BlockSpec((bp, m * ksub), lambda t, b, blk_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, lanes),
                         lambda t, b, blk_ref: (blk_ref[t * tpb + b], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, tile), lambda t, b, blk_ref: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, lanes), codes128.dtype)],
    )
    return pl.pallas_call(
        functools.partial(_pq_pack_score_kernel, m=m, mg=mg,
                          tpb=tpb, pad_blk=pad_blk, ksub=ksub),
        out_shape=jax.ShapeDtypeStruct((bp, n_tiles * tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(blk, lut_bf, codes128)


@functools.partial(
    jax.jit, static_argnames=("top_k", "nprobe", "cap", "budgets", "n_real",
                              "scan_k", "pq_residual", "interpret"))
def packed_pq_scan(q_raw, q_rot, centroids, list_offsets, codes128, row_perm,
                   pq_books, refine_codes, offset, scale, nlist_valid=None,
                   *, top_k: int, nprobe: int, cap: int, budgets,
                   n_real: int, scan_k: int, pq_residual: bool = False,
                   interpret: bool = False):
    """Packed PQ/OPQ union scan: probe → dedup → exact-length block table →
    Pallas one-hot LUT kernel → (residual add) → exact two-stage top-k →
    optional int8 refine. Same union semantics and tier selection as
    packed_union_scan; same outputs as index/ivf.py:_pq_block_scan.

    codes128: [N_pad, lanes] uint8 PQ codes lane-padded to a multiple of
    128 (pad columns are ignored — the kernel slices [:, :M])."""
    from densephrases_tpu.ops.pq import pq_lut

    if isinstance(budgets, int):
        budgets = (budgets,)
    b, d = q_raw.shape
    nlist = centroids.shape[0]
    m = pq_books.shape[0]
    ksub = pq_books.shape[1]

    # ---- probe (bf16 MXU; f32 centroid scores for the residual term)
    c_scores = jnp.einsum("bd,nd->bn", q_raw.astype(jnp.bfloat16),
                          centroids.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if nlist_valid is not None:
        c_scores = jnp.where(
            jnp.arange(nlist)[None, :] < nlist_valid, c_scores, NEG_INF)
    _, probe_ids = jax.lax.top_k(c_scores, nprobe)
    if pq_residual:
        cs32 = jnp.einsum("bd,nd->bn", q_raw, centroids,
                          preferred_element_type=jnp.float32)

    # ---- dedup probed lists on device (sentinel sorts last)
    flat = jnp.sort(probe_ids.reshape(-1))
    keep = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uniq = jnp.sort(jnp.where(keep, flat, nlist))  # [U]
    u_n = uniq.shape[0]
    valid_l = uniq < nlist
    lic = jnp.minimum(uniq, nlist - 1).astype(jnp.int32)
    offs = list_offsets[lic]
    lens = jnp.where(valid_l,
                     jnp.minimum(list_offsets[lic + 1] - offs, cap), 0)

    # ---- 32-row block table with disjoint coverage (module docstring)
    pad_blk = codes128.shape[0] // RB - 1
    b0 = offs // RB
    e = (offs + lens + RB - 1) // RB
    start = jnp.maximum(b0, jnp.concatenate(
        [jnp.zeros((1,), e.dtype), e[:-1]]))
    bc = jnp.where(valid_l, jnp.maximum(e - start, 0), 0)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bc).astype(jnp.int32)])
    total = cum[u_n]
    _overflow_warn(total, budgets[-1], "packed_pq_scan")

    bp = _round_up(max(b, 16), 16)  # bf16 sublane tile
    lut = pq_lut(pq_books, q_rot).reshape(b, -1).astype(jnp.bfloat16)
    lut_bf = jnp.zeros((bp, m * ksub), jnp.bfloat16).at[:b].set(lut)

    def scan_at(budget: int):
        def run(_):
            j = jnp.arange(budget, dtype=jnp.int32)
            u_of = jnp.clip(
                jnp.searchsorted(cum, j, side="right") - 1, 0, u_n - 1)
            blk = jnp.where(j < total, start[u_of] + (j - cum[u_of]),
                            pad_blk).astype(jnp.int32)
            raw = _pq_pack_score(lut_bf, codes128, blk, budget=budget,
                                 m=m, ksub=ksub, interpret=interpret)[:b]
            r = jnp.arange(budget * RB, dtype=jnp.int32)
            src = blk[r // RB] * RB + (r % RB)  # packed row -> sorted row
            valid = ((r // RB) < total) & (src < n_real)
            s = raw
            if pq_residual:
                # TRUE owning list per row (edge rows belong to the
                # adjacent list — their residual base must be their own
                # centroid; see _pq_block_scan)
                rlist = jnp.clip(
                    jnp.searchsorted(list_offsets, src, side="right") - 1,
                    0, nlist - 1)
                s = s + jnp.take(cs32, rlist, axis=1)
            s = jnp.where(valid[None, :], s, NEG_INF)
            k = min(scan_k, s.shape[1])
            vals, pos = _topk2(s, k)
            srows = jnp.take(src, pos)
            k_out = min(scan_k, budgets[-1] * RB)
            if k < k_out:
                vals = jnp.concatenate(
                    [vals, jnp.full((b, k_out - k), NEG_INF)], axis=1)
                srows = jnp.concatenate(
                    [srows, jnp.zeros((b, k_out - k), srows.dtype)],
                    axis=1)
            return vals, srows
        return run

    run = scan_at(budgets[-1])
    for small in reversed(budgets[:-1]):
        def run(_, small=small, big=run):
            return jax.lax.cond(total <= small, scan_at(small), big, None)
    vals, srows = run(None)

    gids = row_perm[jnp.clip(srows, 0, row_perm.shape[0] - 1)]
    if refine_codes is not None:
        # exact int8 re-ranking in the UNROTATED space (as _pq_block_scan)
        cand = refine_codes[jnp.clip(gids, 0, refine_codes.shape[0] - 1)]
        qsum_r = q_raw.sum(-1) * offset
        s = jnp.einsum("bd,bcd->bc", q_raw.astype(jnp.bfloat16),
                       cand.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s / scale + qsum_r[:, None]
        s = jnp.where(vals > NEG_INF / 2, s, NEG_INF)
        vals, pos = jax.lax.top_k(s, min(top_k, s.shape[1]))
        gids = jnp.take_along_axis(gids, pos, axis=1)
    else:
        k = min(top_k, vals.shape[1])
        vals, gids = vals[:, :k], gids[:, :k]
    return vals, gids
