"""IVF-PQ / IVF-SQ8 index: TPU-resident approximate MIPS.

Replaces the FAISS IVF pipeline (train/add/search:
ref build_phrase_index.py:96-279, index.py:28-62,189-202):

Build (all matmul work on TPU):
- coarse centroids: Lloyd k-means (ops/kmeans.py)
- optional OPQ rotation + PQ codebooks (ops/opq.py, ops/pq.py), or SQ8
  (reuse the store's int8 codes directly)
- assignment by max inner product (the reference's coarse quantizer is
  IndexFlatIP, build_phrase_index.py:99)
- rows *sorted by list*: each inverted list is a contiguous range of the
  code matrix — list scan = contiguous DMA, no pointer chasing. idx2id
  becomes a single permutation array (sorted row → original global id),
  replacing the offset-encoded idx2id HDF5 (ref: index.py:124-141).

Search (one jit, static shapes):
- probe: [B, nlist] matmul + top-nprobe
- scan: ``lax.scan`` over probes; per probe a fixed-size dynamic_slice of
  CAP rows per query (CAP = max list length, so no truncation), scored
  either by int8 matmul (SQ8) or PQ lookup tables. PQ LUT lookup avoids
  TPU gathers via a per-subspace one-hot matmul (see ops/pq.py).
- running top-k merged across probes, exactly like the flat scan.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import re
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.ops.kmeans import (
    accumulate_blocks,
    assign_blocks,
    assign_blocks_hier,
    assign_corpus_hier,
    assign_hier_streamed,
    kmeans,
    kmeans_two_level,
    sort_children,
)
from densephrases_tpu.ops.opq import OPQ, train_opq
from densephrases_tpu.ops.pq import (
    PQCodebook,
    codes_to_onehot,
    pack_nibbles,
    pq_encode,
    pq_lut,
    train_pq,
    unpack_nibbles_dev,
)
from densephrases_tpu.ops.ivf_pack import (
    RB as PACK_RB,
    TPB as PACK_TPB,
    pack_budget_table,
    packed_pq_scan,
    packed_union_scan,
)
from densephrases_tpu.ops.quant import (
    DEFAULT_OFFSET,
    DEFAULT_SCALE,
    INT4_OFFSET,
    INT4_SCALE,
    float_to_int4,
    train_int4_ranges,
)
from densephrases_tpu.ops.topk import topk_merge

NEG_INF = jnp.float32(-1e30)

_FQ_PQ_RE = re.compile(r"^(OPQ|PQ)(\d+)(?:x(\d+))?$")


def parse_pq_quant(fq: str):
    """Parse a PQ/OPQ fine_quant spec → (kind, M, nbits) or None.

    "OPQ96" = 96 subspaces × 8 bits (the reference's flagship config,
    ref build_phrase_index.py:109-116); "OPQ192x4" = 192 subspaces ×
    4 bits (FAISS PQx4 fast-scan role) — SAME bytes per code, 16-wide
    one-hot at serve (≈8× fewer scan MACs; codes stored nibble-packed)."""
    mt = _FQ_PQ_RE.match(fq)
    if not mt:
        return None
    return mt.group(1), int(mt.group(2)), int(mt.group(3) or 8)


def _pq_unpack_cand(cand, pq_books):
    """Unpack candidate code rows for the one-hot scans when the books
    are 4-bit (ksub=16): [..., M//2] packed bytes → [..., M] int32."""
    if pq_books.shape[1] == 16:
        return unpack_nibbles_dev(cand, int(pq_books.shape[0]))
    return cand


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# NOTE: every large array is an explicit jit ARGUMENT in the searchers
# below. Closing over a multi-GB device array embeds it as an HLO constant,
# which (besides being wasteful) makes the serialized program gigantic —
# large enough to break remote-compile transports.
@functools.partial(jax.jit,
                   static_argnames=("top_k", "nprobe", "cap", "scan_k",
                                    "pq_residual"))
def _probe_score(q_raw, q_rot, centroids, list_offsets, codes, row_perm,
                 pq_books, refine_codes, offset, scale, nlist_valid=None, *,
                 top_k: int, nprobe: int, cap: int, scan_k: int,
                 pq_residual: bool = False):
    """Per-probe IVF scan (single-query / tiny-batch path).

    nlist_valid (optional device scalar): number of REAL centroids — rows
    beyond it are shape padding (mesh-sharded stacking) and are masked out
    of the probe."""
    b, d = q_raw.shape
    is_pq = pq_books is not None
    do_refine = is_pq and refine_codes is not None

    # ---- probe (ref: nprobe=256 IVF probe, index.py:53,62)
    c_scores = jnp.einsum("bd,nd->bn", q_raw.astype(jnp.bfloat16),
                          centroids.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if nlist_valid is not None:
        c_scores = jnp.where(
            jnp.arange(centroids.shape[0])[None, :] < nlist_valid,
            c_scores, NEG_INF)
    _, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]

    if is_pq:
        lut_bf = pq_lut(pq_books, q_rot).astype(jnp.bfloat16)  # [B, M, 256]
    else:
        # offset may be a per-dim vector (trained int4 ranges) — for a
        # scalar this reduces to q.sum * offset exactly
        qsum = (q_rot * offset).sum(-1)
        q_bf = q_rot.astype(jnp.bfloat16)

    col = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def probe_step(carry, p_idx):
        best_s, best_i = carry
        lists = probe_ids[:, p_idx]  # [B]
        offs = list_offsets[lists]  # [B]
        lens = list_offsets[lists + 1] - offs

        cand = jax.vmap(
            lambda o: jax.lax.dynamic_slice(
                codes, (o, 0), (cap, codes.shape[1]))
        )(offs)  # [B, cap, M or D]

        if is_pq:
            # per-subspace one-hot matmul (no gathers; ops/pq.py)
            ksub = int(pq_books.shape[1])
            m = int(pq_books.shape[0])
            cand = _pq_unpack_cand(cand, pq_books)  # 4-bit: nibble unpack
            iota = jax.lax.broadcasted_iota(jnp.int32, (b, cap, m, ksub), 3)
            oh = (cand[..., None].astype(jnp.int32) == iota).astype(jnp.bfloat16)
            s = jnp.einsum("bmk,bcmk->bc", lut_bf, oh,
                           preferred_element_type=jnp.float32)
            if pq_residual:
                # residual codes: add back the exact q·centroid term in f32
                # (the bf16 probe scores carry ~2^-9 relative error — a
                # per-list bias that would shuffle cross-list candidate
                # ranking at these score gaps)
                c_sel = jnp.take(centroids, lists, axis=0)  # [B, D]
                s = s + jnp.sum(q_raw * c_sel, axis=-1)[:, None]
        else:
            s = jnp.einsum("bd,bcd->bc", q_bf, cand.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            s = s / scale + qsum[:, None]

        valid = col < lens[:, None]
        s = jnp.where(valid, s, NEG_INF)
        rows = offs[:, None] + col  # sorted-row ids
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, rows], axis=1)
        vals, pos = jax.lax.top_k(cat_s, scan_k)
        ids = jnp.take_along_axis(cat_i, pos, axis=1)
        return (vals, ids), None

    init = (jnp.full((b, scan_k), NEG_INF, jnp.float32),
            jnp.zeros((b, scan_k), jnp.int32))
    (vals, rows), _ = jax.lax.scan(init=init, xs=jnp.arange(nprobe),
                                   f=probe_step)
    gids = row_perm[jnp.clip(rows, 0, row_perm.shape[0] - 1)]

    if do_refine:
        # exact int8 re-ranking of the PQ candidates (one gather + one
        # batched matvec; the int8 matrix is the store's own)
        cand = refine_codes[jnp.clip(gids, 0, refine_codes.shape[0] - 1)]
        qsum_r = q_raw.sum(-1) * offset
        s = jnp.einsum("bd,bcd->bc", q_raw.astype(jnp.bfloat16),
                       cand.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s / scale + qsum_r[:, None]
        s = jnp.where(vals > NEG_INF / 2, s, NEG_INF)
        vals, pos = jax.lax.top_k(s, top_k)
        gids = jnp.take_along_axis(gids, pos, axis=1)
    return vals, gids


@functools.partial(jax.jit,
                   static_argnames=("top_k", "nprobe", "cap", "group",
                                    "scan_k", "sq4", "pq_residual"))
def _union_scan(q_raw, q_rot, centroids, list_offsets, codes, row_perm,
                pq_books, refine_codes, offset, scale, nlist_valid=None, *,
                top_k: int, nprobe: int, cap: int, group: int, scan_k: int,
                sq4: bool = False, pq_residual: bool = False):
    """Batched union scan, entirely on device (no host round-trips).

    Probe all queries, dedupe the probed lists with a device sort (duplicates
    become an nlist sentinel that sorts last), then scan the unique lists in
    groups: per group one contiguous dynamic-slice DMA per list, ONE shared
    score matmul for the whole query batch, and per-query masking down to the
    lists that query actually probed. Bandwidth is paid once per unique list
    instead of once per (query, probe) pair — the whole point of the union
    formulation — and nothing syncs to the host."""
    b, d = q_raw.shape
    nlist = centroids.shape[0]
    is_pq = pq_books is not None
    do_refine = is_pq and refine_codes is not None

    # ---- probe (max inner product over centroids, ref: index.py:53,62)
    c_scores = jnp.einsum("bd,nd->bn", q_raw.astype(jnp.bfloat16),
                          centroids.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if nlist_valid is not None:
        c_scores = jnp.where(
            jnp.arange(nlist)[None, :] < nlist_valid, c_scores, NEG_INF)
    _, probe_ids = jax.lax.top_k(c_scores, nprobe)  # [B, P] int32

    # ---- device dedup: sort, sentinel out duplicates, uniques sort first
    flat = jnp.sort(probe_ids.reshape(-1))
    keep = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uniq = jnp.sort(jnp.where(keep, flat, nlist))
    n_slots = b * nprobe
    pad = (-n_slots) % group
    if pad:
        uniq = jnp.concatenate([uniq, jnp.full((pad,), nlist, uniq.dtype)])
    n_groups = (n_slots + pad) // group

    if is_pq:
        flat_lut = pq_lut(pq_books, q_rot).reshape(b, -1).astype(jnp.bfloat16)
    else:
        # vector offset = trained per-dim int4 ranges (scalar-equivalent
        # for the legacy contracts)
        qsum = (q_rot * offset).sum(-1)
        q_bf = q_rot.astype(jnp.bfloat16)

    col = jnp.arange(cap, dtype=jnp.int32)
    mdim = codes.shape[1]

    def step(carry, g):
        best_s, best_i = carry
        lis = jax.lax.dynamic_slice(uniq, (g * group,), (group,))
        ok_list = lis < nlist
        lic = jnp.minimum(lis, nlist - 1).astype(jnp.int32)
        offs = list_offsets[lic]
        lens = list_offsets[lic + 1] - offs
        cand = jax.vmap(
            lambda o: jax.lax.dynamic_slice(codes, (o, 0), (cap, mdim))
        )(offs).reshape(group * cap, mdim)  # contiguous per-list DMA
        if is_pq:
            # [G*cap, M*ksub] bf16 one-hot (VPU compare; nibble unpack
            # first for 4-bit books)
            oh = codes_to_onehot(_pq_unpack_cand(cand, pq_books),
                                 int(pq_books.shape[1]))
            s = jax.lax.dot_general(
                flat_lut, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, G*cap]
            if pq_residual:
                # residual codes: the LUT scored q_rot·(x-c)R; add the
                # exact q·centroid term in f32 (bf16 probe scores carry a
                # per-list bias too large for these score gaps)
                c_sel = jnp.take(centroids, lic, axis=0)  # [G, D] f32
                cc = jax.lax.dot_general(
                    q_raw, c_sel, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [B, G]
                s = (s.reshape(b, group, cap)
                     + cc[:, :, None]).reshape(b, group * cap)
        else:
            if sq4:
                # packed nibbles: high nibble = first half of the feature
                # dim (ops/quant.float_to_int4); offset/scale args carry the
                # int4 affine contract
                v = cand.astype(jnp.int32) & 0xFF
                cand = jnp.concatenate([v >> 4, v & 0xF], axis=-1)
            s = jax.lax.dot_general(
                q_bf, cand.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s / scale + qsum[:, None]
        # per-query masking: did this query probe this list?
        memb = jnp.any(probe_ids[:, None, :] == lic[None, :, None], axis=-1)
        memb = memb & ok_list[None, :]  # [B, G]
        colv = col[None, :] < lens[:, None]  # [G, cap]
        mask = (memb[:, :, None] & colv[None, :, :]).reshape(b, group * cap)
        s = jnp.where(mask, s, NEG_INF)
        rows = (offs[:, None] + col[None, :]).reshape(group * cap)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(rows[None, :], (b, group * cap))],
            axis=1)
        vals, pos = jax.lax.top_k(cat_s, scan_k)
        ids = jnp.take_along_axis(cat_i, pos, axis=1)
        return (vals, ids), None

    init = (jnp.full((b, scan_k), NEG_INF, jnp.float32),
            jnp.zeros((b, scan_k), jnp.int32))
    (vals, sorted_rows), _ = jax.lax.scan(step, init, jnp.arange(n_groups))
    gids = row_perm[jnp.clip(sorted_rows, 0, row_perm.shape[0] - 1)]
    if do_refine:
        # exact int8 re-ranking in the UNROTATED space (refine_codes are the
        # store's raw int8 vectors)
        cand = refine_codes[jnp.clip(gids, 0, refine_codes.shape[0] - 1)]
        qsum_r = q_raw.sum(-1) * offset
        s = jnp.einsum("bd,bcd->bc", q_raw.astype(jnp.bfloat16),
                       cand.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s / scale + qsum_r[:, None]
        s = jnp.where(vals > NEG_INF / 2, s, NEG_INF)
        vals, pos = jax.lax.top_k(s, min(top_k, s.shape[1]))
        gids = jnp.take_along_axis(gids, pos, axis=1)
    return vals, gids


def _pq_chunk() -> int:
    """LUT-scan chunk rows (DPH_PQ_CHUNK): bigger chunks mean fewer
    sequential scan steps and fatter [B, M*256] @ [M*256, chunk] MXU
    matmuls, at the cost of a larger per-step one-hot working set."""
    return int(os.environ.get("DPH_PQ_CHUNK", 2048))


@functools.partial(jax.jit, static_argnames=(
    "top_k", "nprobe", "scan_k", "budgets", "n_real", "chunk",
    "pq_residual"))
def _pq_block_scan(q_raw, q_rot, centroids, list_offsets, codes, row_perm,
                   pq_books, refine_codes, offset, scale, nlist_valid=None,
                   *, top_k: int, nprobe: int, scan_k: int, budgets: tuple,
                   n_real: int, chunk: int = 2048,
                   pq_residual: bool = False):
    """Exact-length PQ union scan: block-gather + chunked LUT matmuls.

    The grouped PQ union scan reads every probed list through a CAP-row
    dynamic_slice and expands a [cap, M*256] one-hot PER LIST: at 10.5M /
    OPQ96 (cap 2384, mean 146) that is a 16× read/expand amplification
    across ~1024 serial scan steps — measured 1.59 s amortized per b64
    search. This scan adopts the packed SQ8 scan's geometry (ops/ivf_pack:
    32-row blocks covering exactly each unique probed list's extent,
    disjoint-coverage block table, tiered static budgets picked by
    lax.cond on the batch's actual block total) but stays in pure XLA:
    the block rows are materialized with ONE device gather, scored in
    fat [chunk, M*256] one-hot MXU matmuls (~90 steps instead of ~1024),
    and reduced with an exact two-stage top-k.

    Same union semantics as the packed scan: every query scores the whole
    union of the batch's probed lists (a candidate superset — no
    per-query membership mask), plus up-to-31 edge rows per list boundary
    whose scores are computed with their TRUE list's centroid (row→list
    via searchsorted), so residual scoring stays exact for them.

    Ref role: the FAISS IVFPQ/OPQ inverted-list ADC scan
    (/root/reference/densephrases/index.py:189-202; IndexIVFPQ in
    build_phrase_index.py:109-116)."""
    b, d = q_raw.shape
    nlist = centroids.shape[0]
    mdim = codes.shape[1]
    rb = PACK_RB

    # ---- probe (bf16 MXU) + f32 centroid scores for residual adjustment
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

    # ---- device dedup (sort + sentinel; sentinels sort last)
    flat = jnp.sort(probe_ids.reshape(-1))
    keep = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    uniq = jnp.sort(jnp.where(keep, flat, nlist))  # [U] ascending
    u = uniq.shape[0]
    ok = uniq < nlist
    lic = jnp.minimum(uniq, nlist - 1).astype(jnp.int32)
    offs = list_offsets[lic]
    ends = list_offsets[lic + 1]
    b0 = offs // rb
    e = jnp.where(ok, (ends + rb - 1) // rb, b0)  # sentinel: 0 blocks
    # disjoint coverage: start at max(own start block, prev list's end
    # block) — provably complete (see ops/ivf_pack module docstring)
    prev_e = jnp.concatenate([jnp.zeros((1,), e.dtype), e[:-1]])
    adj_b0 = jnp.maximum(b0, prev_e)
    nblk = jnp.maximum(e - adj_b0, 0)
    starts = jnp.cumsum(nblk) - nblk  # exclusive prefix
    total = starts[-1] + nblk[-1]

    flat_lut = pq_lut(pq_books, q_rot).reshape(b, -1).astype(jnp.bfloat16)

    def run_budget(bb: int):
        n_rows = _round_up(bb * rb, chunk)
        steps = n_rows // chunk
        j = jnp.arange(bb, dtype=jnp.int32)
        owner = jnp.clip(
            jnp.searchsorted(starts, j, side="right") - 1, 0, u - 1)
        valid_b = j < total
        row0 = (adj_b0[owner] + (j - starts[owner])) * rb
        rows = (row0[:, None]
                + jnp.arange(rb, dtype=jnp.int32)[None, :]).reshape(-1)
        vrow = (jnp.broadcast_to(valid_b[:, None], (bb, rb)).reshape(-1)
                & (rows < n_real))
        pad = n_rows - bb * rb
        if pad:
            rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
            vrow = jnp.concatenate([vrow, jnp.zeros((pad,), bool)])
        rows = jnp.clip(rows, 0, codes.shape[0] - 1)
        cand = jnp.take(codes, rows, axis=0)  # [n_rows, M] one gather
        if pq_residual:
            # TRUE owning list per row (edge rows belong to the adjacent
            # list — their residual base must be their own centroid)
            rlist = jnp.clip(
                jnp.searchsorted(list_offsets, rows, side="right") - 1,
                0, nlist - 1)
        else:
            rlist = jnp.zeros_like(rows)

        # exact two-stage top-k, stage 1 INSIDE the scan body: emitting
        # raw chunk scores and reducing after the loop materializes a
        # [steps, B, chunk] f32 buffer (2.6 GB at the 160k-block guard
        # tier with a stacked B=128 serve batch — the OOM that killed the
        # 10.5M e2e serve), while per-chunk winners are [steps, B, k1]
        # (~50 MB). Chunk-local top-k then a final top-k across chunks is
        # exact — no score can beat a winner it lost to inside its chunk.
        k1 = min(scan_k, chunk)

        def body(_, xs):
            codes_ch, ids_ch, v_ch = xs
            # [chunk, M*ksub] bf16 (4-bit books: nibble unpack first)
            oh = codes_to_onehot(_pq_unpack_cand(codes_ch, pq_books),
                                 int(pq_books.shape[1]))
            s = jax.lax.dot_general(
                flat_lut, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, chunk]
            if pq_residual:
                s = s + jnp.take(cs32, ids_ch, axis=1)
            s = jnp.where(v_ch[None, :], s, NEG_INF)
            return None, jax.lax.top_k(s, k1)  # [B, k1] winners + cols

        _, (seg_v, seg_i) = jax.lax.scan(
            body, None,
            (cand.reshape(steps, chunk, mdim),
             rlist.reshape(steps, chunk), vrow.reshape(steps, chunk)))
        seg_i = (seg_i
                 + (jnp.arange(steps, dtype=jnp.int32) * chunk)[:, None,
                                                                None])
        cat_v = jnp.moveaxis(seg_v, 0, 1).reshape(b, steps * k1)
        cat_i = jnp.moveaxis(seg_i, 0, 1).reshape(b, steps * k1)
        k2 = min(scan_k, steps * k1)
        vals, pos = jax.lax.top_k(cat_v, k2)
        cols = jnp.take_along_axis(cat_i, pos, axis=1)
        srows = jnp.take(rows, cols)  # [b, k2] sorted-row ids
        if k2 < scan_k:  # tiny-corpus tiers: pad to the common shape
            padn = scan_k - k2
            vals = jnp.concatenate(
                [vals, jnp.full((b, padn), NEG_INF)], axis=1)
            srows = jnp.concatenate(
                [srows, jnp.zeros((b, padn), srows.dtype)], axis=1)
        return vals, srows

    if len(budgets) == 1:
        vals, srows = run_budget(budgets[0])
    else:
        # smallest sufficient tier wins; the last tier is the guard
        def chain(i):
            if i == len(budgets) - 1:
                return lambda: run_budget(budgets[i])
            return lambda: jax.lax.cond(
                total <= budgets[i],
                lambda: run_budget(budgets[i]), chain(i + 1))
        vals, srows = chain(0)()

    gids = row_perm[jnp.clip(srows, 0, row_perm.shape[0] - 1)]
    if refine_codes is not None:
        # exact int8 re-ranking in the UNROTATED space (as _union_scan)
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


def _split_centroid(c: np.ndarray, n_extra: int, eps: float = 1e-2):
    """Geometric cluster split: n_extra ε-scaled copies of centroid c.

    Seeding splits from member POINTS fails in high dimension — every
    member of an isotropic blob is closer to the blob MEAN than to any
    other member (E‖x−m‖ = σ√d vs E‖x−x'‖ = σ√(2d)), so no row ever
    reassigns. Scaled copies c·(1 ± jε) partition by the x·c projection
    instead — effective for genuinely multi-modal lists, but a TIGHT blob
    (spread below the bf16 score resolution) still may not split; the
    build's backstop for those is ``_force_partition``."""
    j = np.arange(1, n_extra + 1, dtype=np.float32)
    sgn = np.where(j % 2 == 0, 1.0, -1.0)
    f = 1.0 + sgn * eps * np.ceil(j / 2)
    return c[None, :] * f[:, None]


def _force_partition(centroids: np.ndarray, assign: np.ndarray, cap: float,
                     l1_cents: Optional[np.ndarray] = None,
                     budget: Optional[int] = None):
    """Deterministic backstop for lists geometric splitting cannot break.

    Any list longer than ``cap`` has its member ROWS partitioned directly
    into cap-sized parts under duplicated centroids. Duplicates tie in
    probe scores and therefore occupy adjacent probe ranks: a query near
    the blob probes all of its parts together (parts-per-list ≤ a few ≪
    nprobe), so recall is unaffected while the fixed-cap scan length —
    and with it the whole batched-scan bandwidth — drops to cap. MUST be
    the last balance step (a geometric reassignment would undo it).

    budget: optional hard ceiling on ADDED centroids (the nlist growth
    cap, VERDICT r3 weak #3). Longest lists are partitioned first — each
    duplicated centroid spent on the longest list removes the most scan
    length — and a list may be PARTIALLY partitioned when the budget runs
    out mid-list (every cap-sized part split off still shortens the max).
    Residual over-cap lists are logged; search handles them via
    max_list_scan truncation.

    Returns (centroids, parent_offsets | None, assign)."""
    import logging

    k = centroids.shape[0]
    counts = np.bincount(assign, minlength=k)
    cap_i = max(int(cap), 1)
    over = np.nonzero(counts > cap_i)[0]
    # longest first: best max-list reduction per centroid spent
    over = over[np.argsort(-counts[over], kind="stable")]
    if len(over) == 0 or (budget is not None and budget <= 0):
        if budget is not None and budget <= 0 and len(over) > 0:
            logging.getLogger(__name__).info(
                "force_partition: nlist budget exhausted; %d lists remain "
                "over cap %d (max %d) — bounded by max_list_scan at search",
                len(over), cap_i, int(counts[over[0]]))
        if l1_cents is not None:
            centroids, parent_offs, order_c = sort_children(
                centroids, l1_cents)
            inv = np.empty(len(order_c), np.int64)
            inv[order_c] = np.arange(len(order_c))
            return centroids, parent_offs, inv[assign].astype(np.int32)
        return centroids, None, assign
    order = np.argsort(assign, kind="stable")
    bounds = np.searchsorted(assign[order], np.arange(k + 1))
    assign = assign.copy()
    new_cents = [centroids]
    next_id = k
    remaining = budget if budget is not None else np.inf
    residual = 0
    for li in over:
        mem = order[bounds[li]:bounds[li + 1]]
        for p0 in range(cap_i, len(mem), cap_i):
            if remaining <= 0:
                break
            assign[mem[p0:p0 + cap_i]] = next_id
            new_cents.append(centroids[li][None, :])
            next_id += 1
            remaining -= 1
        else:
            continue
        residual += 1  # budget ran out inside this list
    if remaining <= 0 and residual:
        logging.getLogger(__name__).info(
            "force_partition: budget hit with %d lists still over cap %d",
            residual, cap_i)
    centroids = np.concatenate(new_cents).astype(np.float32)
    if l1_cents is not None:
        centroids, parent_offs, order_c = sort_children(centroids, l1_cents)
        inv = np.empty(len(order_c), np.int64)
        inv[order_c] = np.arange(len(order_c))
        return centroids, parent_offs, inv[assign].astype(np.int32)
    return centroids, None, assign


def _eps_split_plan(counts: np.ndarray, oversized: np.ndarray, cap: float,
                    budget: Optional[float]):
    """Budget-aware ε-split allocation: oversized lists LONGEST FIRST,
    each claiming ceil(count/cap)-1 extra centroids; lists that no longer
    fit the remaining budget (after reserving what a terminal
    force-partition of the UNSPLIT lists would itself consume) are left
    for the force-partition backstop. Returns (list_ids, n_extras)."""
    oversized = oversized[np.argsort(-counts[oversized], kind="stable")]
    need = np.ceil(counts[oversized] / cap).astype(np.int64) - 1
    if budget is None:
        return oversized, need
    # reserve: force-partitioning list i later costs the same need[i], so
    # an ε split never increases the terminal worst case — take lists in
    # order while the TOTAL claim (split + unsplit reserve) fits
    take = np.cumsum(need) <= budget
    return oversized[take], need[take]


def _balance_lists(x: np.ndarray, centroids: np.ndarray, assign: np.ndarray,
                   balance_factor: float = 4.0, rounds: int = 3,
                   seed: int = 0, verbose: bool = False,
                   offset: float = 0.0, scale: float = 1.0,
                   growth_cap: Optional[float] = None):
    """Split oversized inverted lists: seed extra centroids from members of
    lists longer than balance_factor×mean, then one Lloyd refinement +
    reassignment per round. Grows the centroid count as needed — bounded
    by growth_cap x the initial count when given (VERDICT r3 weak #3:
    unbounded balancing grew nlist 52%, inflating probe cost silently).

    x may be int8 codes (shipped raw to the device with on-the-fly affine
    equivalence; see ops/kmeans.accumulate_blocks)."""
    import logging

    quant = x.dtype == np.int8

    def deq(rows):
        return rows.astype(np.float32) / scale + offset if quant \
            else rows.astype(np.float32)

    # cap is fixed from the INITIAL k: recomputing per round shrinks it as
    # splitting grows k, spiralling into ever-more "oversized" lists
    k0 = centroids.shape[0]
    cap = balance_factor * max(len(x) / k0, 1.0)
    budget_total = (None if growth_cap is None
                    else max(int(np.ceil(growth_cap * k0)) - k0, 0))
    prev_over = np.inf
    for _ in range(rounds):
        k = centroids.shape[0]
        counts = np.bincount(assign, minlength=k)
        oversized = np.nonzero(counts > cap)[0]
        if len(oversized) == 0 or len(oversized) >= prev_over:
            break  # done, or geometric splitting is not helping
        prev_over = len(oversized)
        budget = (None if budget_total is None
                  else budget_total - (k - k0))
        split_ids, extras = _eps_split_plan(counts, oversized, cap, budget)
        if len(split_ids) == 0:
            break  # growth budget exhausted; force partition handles it
        new_cents = [centroids]
        for li, n_extra in zip(split_ids, extras):
            new_cents.append(_split_centroid(centroids[li], int(n_extra)))
        centroids = np.concatenate(new_cents, axis=0).astype(np.float32)
        # one Lloyd refinement over the (enlarged) centroid set — streamed
        # device accumulation (host blocks; no O(corpus) device residency)
        sums, cnt, _ = accumulate_blocks(x, centroids, chunk=2048,
                                         offset=offset, scale=scale)
        nz = cnt > 0
        centroids[nz] = sums[nz] / cnt[nz, None]
        assign = assign_blocks(x, centroids, chunk=2048, offset=offset,
                               scale=scale)
        if verbose:
            logging.getLogger(__name__).info(
                "balance round: k %d→%d, max list %d",
                k, centroids.shape[0],
                int(np.bincount(assign, minlength=centroids.shape[0]).max()))
    return centroids, assign


def _balance_lists_hier(x: np.ndarray, centroids: np.ndarray,
                        l1_cents: np.ndarray, assign: np.ndarray,
                        balance_factor: float = 4.0, rounds: int = 3,
                        seed: int = 0, probe: int = 8, verbose: bool = False,
                        offset: float = 0.0, scale: float = 1.0,
                        assign_fn=None, growth_cap: Optional[float] = None,
                        parent_offs: Optional[np.ndarray] = None):
    """Oversized-list splitting for the two-level quantizer: split long
    lists with ε-scaled centroid copies (_split_centroid), re-sort ALL
    children under their nearest level-1 parent, and reassign
    hierarchically (no O(N·k) pass). growth_cap bounds the total centroid
    growth (x the initial count); parent_offs, when given, lets a
    zero-split round return immediately without a wasted full reassign.
    Returns (sorted centroids, l1_cents, parent_offsets, assign)."""
    import logging

    # fixed cap from the initial k (see _balance_lists)
    k0 = centroids.shape[0]
    cap = balance_factor * max(len(x) / k0, 1.0)
    budget_total = (None if growth_cap is None
                    else max(int(np.ceil(growth_cap * k0)) - k0, 0))
    prev_over = np.inf
    for _ in range(rounds):
        k = centroids.shape[0]
        counts = np.bincount(assign, minlength=k)
        oversized = np.nonzero(counts > cap)[0]
        no_gain = len(oversized) == 0 or len(oversized) >= prev_over
        if no_gain and parent_offs is not None:
            break  # done, or geometric splitting is not helping
        prev_over = min(prev_over, len(oversized))
        budget = (None if budget_total is None
                  else budget_total - (k - k0))
        split_ids, extras = _eps_split_plan(counts, oversized, cap, budget)
        if len(split_ids) == 0 and parent_offs is not None:
            break  # growth budget exhausted; force partition handles it
        new_cents = [centroids]
        for li, n_extra in zip(split_ids, extras):
            new_cents.append(_split_centroid(centroids[li], int(n_extra)))
        centroids = np.concatenate(new_cents, axis=0).astype(np.float32)
        centroids, parent_offs, _ = sort_children(centroids, l1_cents)
        if assign_fn is not None:
            assign = assign_fn(l1_cents, centroids, parent_offs)
        else:
            assign = assign_blocks_hier(x, l1_cents, centroids, parent_offs,
                                        probe=probe, offset=offset,
                                        scale=scale)
        if verbose:
            logging.getLogger(__name__).info(
                "hier balance round: k %d→%d, max list %d", k,
                centroids.shape[0],
                int(np.bincount(assign, minlength=centroids.shape[0]).max()))
    return centroids, l1_cents, parent_offs, assign


def _sq4_encode_stream(codes_int8: np.ndarray, offset: float, scale: float,
                       int4_offset=INT4_OFFSET, int4_scale=INT4_SCALE,
                       chunk: int = 1 << 18) -> np.ndarray:
    """Streamed int8 → packed-int4 re-quantization (SQ4; ref QT_4bit,
    build_phrase_index.py:103-105). Blocks dequantize + re-quantize on
    device and download packed — no O(corpus) float copy anywhere.

    Chunks are sized so the per-chunk f32 intermediates stay well under
    1 GB of HBM (a 1M-row chunk at d=768 needs ~7 GB of temporaries and
    OOMs a 16 GB chip next to a resident index), and each chunk's device
    buffers are dropped before the next upload."""
    n, d = codes_int8.shape
    assert d % 2 == 0, "int4 packing needs an even feature dim"
    out = np.empty((n, d // 2), np.uint8)
    quant_in = codes_int8.dtype == np.int8
    i4_off = (jnp.asarray(int4_offset, jnp.float32)
              if np.ndim(int4_offset) else float(int4_offset))
    i4_sc = (jnp.asarray(int4_scale, jnp.float32)
             if np.ndim(int4_scale) else float(int4_scale))
    for s in range(0, n, chunk):
        blk = jnp.asarray(np.ascontiguousarray(codes_int8[s:s + chunk]))
        f = (blk.astype(jnp.float32) / scale + offset if quant_in
             else blk.astype(jnp.float32))
        packed = float_to_int4(f, i4_off, i4_sc)
        out[s:s + chunk] = np.asarray(packed)  # blocks: one chunk in flight
        del blk, f, packed
    return out.view(np.int8)


@dataclass
class IVFConfig:
    num_clusters: int = 1024
    fine_quant: str = "SQ8"  # SQ8 | SQ4 | PQ<m> | OPQ<m>  (ref naming, :24-28)
    kmeans_iters: int = 10
    pq_iters: int = 6
    opq_iters: int = 4
    sample_ratio: float = 1.0  # train on a subsample (ref doc/vec_sample_ratio)
    norm_th: float = 999.0  # drop large-norm vectors from the training
    # sample (ref: build_phrase_index.py:60-93 norm filter)
    seed: int = 0
    # PQ candidates are re-ranked with exact int8 scores: scan k*refine_factor
    # with PQ, rescore those rows against the store's int8 codes (which the
    # phrase store keeps for stage-2 span search anyway), keep top-k.
    refine_factor: int = 4
    # hard ceiling on per-list scan length: lists longer than this are
    # truncated at search time (skew guard; logged at build). Also bounds
    # the per-probe program size — large caps explode the compile.
    max_list_scan: int = 8192
    # batched queries route to the union-scan formulation (bandwidth and
    # compile-size independent of cap; see search_union)
    prefer_union_batch: int = 4
    # lists longer than balance_factor * mean are split at build time
    balance_factor: float = 4.0
    # hard ceiling on balance-driven centroid growth: actual nlist <=
    # nlist_growth_cap * num_clusters. Unbounded balancing silently grew
    # nlist 52% at 10.5M (probe matmul + centroid memory grow with it);
    # under the cap, longest lists are force-partitioned first and any
    # residual skew is bounded by max_list_scan at search time.
    # None = legacy unbounded behavior.
    nlist_growth_cap: Optional[float] = 1.1
    # at num_clusters >= this, train the coarse quantizer with two-level
    # k-means and assign hierarchically — O(N·(√k + probe·cap)) instead of
    # O(N·k), which is what makes nlist = 10^5..10^6 feasible (the reference
    # builds 1,048,576 clusters, ref: README.md:330)
    two_level_clusters: int = 8192
    # parents probed during hierarchical assignment (accuracy/speed knob)
    assign_probe: int = 8
    # SQ4: train per-dim int4 ranges from the sample (FAISS QT_4bit
    # parity) instead of the fixed global INT4_OFFSET/INT4_SCALE affine
    sq4_train_ranges: bool = True
    # PQ/OPQ codes encode the RESIDUAL to the assigned coarse centroid
    # (FAISS IVFPQ by_residual=True — the reference's IndexIVFPQ default,
    # build_phrase_index.py:109-116). Full-vector PQ error swamps the
    # within-list score gaps: measured recall@20 0.18 at 10.5M/OPQ96
    # because all probed rows share the query's neighborhood and the
    # codes spend their bits on the common centroid component. Residual
    # encoding removes that component; search adds the exact f32
    # q·centroid term back per probed list. Old pickled configs lack the
    # field and load as False (their codes are full-vector).
    pq_residual: bool = True
    # explicit (offset[D], scale[D]) int4 contract — overrides training;
    # sharded builds use this to share ONE contract across shards
    int4_ranges: Optional[tuple] = None


class IVFIndex:
    """Approximate MIPS index. Same .search API as FlatIndex."""

    def __init__(self, cfg: IVFConfig, centroids, row_perm, list_offsets,
                 codes, rotation=None, pq: Optional[PQCodebook] = None,
                 offset: float = DEFAULT_OFFSET, scale: float = DEFAULT_SCALE,
                 n_total: int = 0, refine_codes=None,
                 int4_offset: float = INT4_OFFSET,
                 int4_scale: float = INT4_SCALE,
                 refine_host=None):
        self.cfg = cfg
        self.sq4 = cfg.fine_quant == "SQ4"
        # scalar = the fixed legacy contract; [D] vectors = trained per-dim
        # ranges (ops/quant.train_int4_ranges; FAISS QT_4bit parity)
        self.int4_vector = np.ndim(int4_offset) > 0
        if self.int4_vector:
            self.int4_offset = jnp.asarray(int4_offset, jnp.float32)
            self.int4_scale = jnp.asarray(int4_scale, jnp.float32)
        else:
            self.int4_offset = float(int4_offset)
            self.int4_scale = float(int4_scale)
        # packed scan wants 32-row-block-addressable codes; align host-side
        # arrays (free for in-RAM arrays), leave already-uploaded device
        # arrays alone. A disk-backed memmap (legacy unaligned save loaded
        # with mmap_mode="r") is NOT padded: np.concatenate would pull the
        # whole corpus into host RAM, defeating the streamed load — those
        # indexes fall back to the grouped scan (their rows already carry
        # the cap padding) until re-saved.
        if (isinstance(codes, np.ndarray) and isinstance(row_perm, np.ndarray)
                and codes.shape[0] % PACK_RB):
            if isinstance(codes, np.memmap):
                import logging

                logging.getLogger(__name__).info(
                    "legacy unaligned codes (%d rows, block %d): packed "
                    "scan disabled for this memmap-loaded index (grouped "
                    "scan serves it); rebuild to enable", codes.shape[0],
                    PACK_RB)
            else:
                extra = (-codes.shape[0]) % PACK_RB
                codes = np.concatenate(
                    [codes, np.zeros((extra,) + codes.shape[1:],
                                     codes.dtype)])
                row_perm = np.concatenate(
                    [row_perm, np.zeros(extra, row_perm.dtype)])
        self.centroids = jnp.asarray(centroids, jnp.float32)  # [nlist, D]
        self.row_perm = jnp.asarray(row_perm)  # [N_pad] sorted row -> global id
        self.list_offsets = jnp.asarray(list_offsets, jnp.int32)  # [nlist+1]
        self.codes = jnp.asarray(codes)  # [N_pad, M] u8 (PQ) or [N_pad, D] i8
        self.rotation = None if rotation is None else jnp.asarray(rotation, jnp.float32)
        self.pq = pq
        self.pq_books = None if pq is None else jnp.asarray(pq.codebooks)
        self.offset = float(offset)
        self.scale = float(scale)
        self.n_total = n_total
        self.refine_codes = (None if refine_codes is None
                             else jnp.asarray(refine_codes))  # [N, D] int8
        # host-tier int8 refine (PQ memory point, VERDICT r4 missing #2):
        # the original-order int8 matrix stays a host MEMMAP; the device
        # scan returns scan_k PQ candidates and the exact re-rank runs in
        # numpy over a B x scan_k row gather — no D-bytes-per-row array
        # ever reaches HBM. Only used when refine_codes is absent.
        self.refine_host = refine_host
        # residual-encoded PQ codes (search must add q·centroid back).
        # __dict__.get, NOT getattr: a pre-residual pickled cfg lacks the
        # INSTANCE attribute and getattr would fall through to the class
        # default (True), silently mis-scoring legacy full-vector codes
        self.pq_residual = (pq is not None
                            and bool(cfg.__dict__.get("pq_residual", False)))
        # host-side references (when constructed from host arrays): lets
        # save() write from host memory instead of pulling the device
        # copy back over a slow D2H link; dropped after the first save
        self._host_arrays = {
            k: v for k, v in (("codes", codes), ("refine", refine_codes))
            if isinstance(v, np.ndarray)}
        lens = np.diff(np.asarray(list_offsets))
        self.cap = int(_round_up(max(int(lens.max()), 8), 8))
        if self.cap > cfg.max_list_scan:
            import logging

            logging.getLogger(__name__).warning(
                "IVF list skew: longest list %d > max_list_scan %d; "
                "oversized lists will be scan-truncated", self.cap,
                cfg.max_list_scan)
            self.cap = cfg.max_list_scan
        # exact-length packed union scan (ops/ivf_pack): viable for the
        # raw-code quantizers whenever the code rows are 32-block-aligned
        self.n_real = int(np.asarray(list_offsets)[-1])
        self._packed_ok = (pq is None
                           and int(self.codes.shape[0]) % PACK_RB == 0)
        # exact-length PQ block scan (_pq_block_scan): same alignment rule
        self._pq_block_ok = (pq is not None
                             and int(self.codes.shape[0]) % PACK_RB == 0)
        self._pack_table = pack_budget_table(np.asarray(list_offsets),
                                             self.cap)
        # mean blocks per list: sizes the packed scan's SMALL budget tier
        # (worst case = _pack_table; see _pack_budgets)
        nlist = max(len(self._pack_table), 1)
        self._pack_mean_blk = float(self._pack_table[-1]) / nlist
        self.use_packed = os.environ.get("DPH_PACKED_SCAN", "1") != "0"
        # Pallas PQ LUT scan (ops/ivf_pack.packed_pq_scan): default for
        # PQ/OPQ; DPH_PQ_PALLAS=0 pins the pure-XLA _pq_block_scan
        self._pq_pallas = os.environ.get("DPH_PQ_PALLAS", "1") != "0"
        self._codes128_cache = None
        self._search_cache = {}

    @property
    def _codes128(self):
        """PQ codes lane-padded to a 128 multiple for the Pallas scan
        (pad columns are sliced off inside the kernel). Built lazily —
        one extra device allocation of N x (128-M) bytes."""
        if self._codes128_cache is None:
            lanes = _round_up(int(self.codes.shape[1]), 128)
            self._codes128_cache = jnp.pad(
                jnp.asarray(self.codes),
                ((0, 0), (0, lanes - int(self.codes.shape[1]))))
        return self._codes128_cache

    def compact_pq_serve(self) -> bool:
        """PQ serve-footprint compaction: keep ONLY the lane-padded
        Pallas codes on device and revert ``self.codes`` to the host
        array. Without this a PQ serve holds BOTH copies in HBM
        (M + 128 bytes/row instead of 128); with it, device code bytes
        are exactly the Pallas scan's operand. Callers that still touch
        ``self.codes`` (the pure-XLA fallback scans) pay a per-call
        re-upload, so compaction only applies when the Pallas scan
        serves this index."""
        if (self.pq_books is None or not self._pq_block_ok
                or not self._pq_pallas or not self.use_packed):
            return False
        host = self._host_arrays.get("codes")
        if host is None or host.shape != tuple(self.codes.shape):
            return False
        _ = self._codes128  # materialize the padded device copy first
        self.codes = host   # drop the device reference (frees M bytes/row)
        return True

    # ------------------------------------------------------------- build
    @staticmethod
    def _log_growth(k_req: int, k_act: int, assign: np.ndarray):
        """Requested-vs-actual nlist, prominently (VERDICT r3 weak #3: the
        52% silent growth was only visible by diffing artifacts)."""
        import logging

        counts = np.bincount(assign, minlength=k_act)
        logging.getLogger(__name__).info(
            "nlist requested %d -> actual %d (+%.1f%%); list mean %.1f "
            "max %d", k_req, k_act, 100.0 * (k_act - k_req) / max(k_req, 1),
            float(counts.mean()), int(counts.max()))

    @staticmethod
    def build(codes_int8: np.ndarray, cfg: IVFConfig,
              offset: float = DEFAULT_OFFSET, scale: float = DEFAULT_SCALE,
              verbose: bool = False,
              coarse_cache: Optional[str] = None) -> "IVFIndex":
        """codes_int8: the store's int8 vectors [N, D] (quantized floats).

        coarse_cache: optional directory caching the trained coarse
        quantizer (centroids + corpus assignment). Building several fine
        quantizations of ONE corpus (SQ8/SQ4/OPQ variants, the reference's
        index sweep in build_phrase_index.py:95-116) then shares the
        expensive coarse phase — at 10M x 768 that phase is ~40 min.
        """
        centroids, assign, sample_cache = IVFIndex.build_coarse(
            codes_int8, cfg, offset=offset, scale=scale, verbose=verbose,
            coarse_cache=coarse_cache)
        return IVFIndex._finish_build(
            codes_int8, cfg, centroids, assign, offset, scale, verbose,
            sample_cache=sample_cache)

    @staticmethod
    def build_coarse(codes_int8: np.ndarray, cfg: IVFConfig,
                     offset: float = DEFAULT_OFFSET,
                     scale: float = DEFAULT_SCALE, verbose: bool = False,
                     coarse_cache: Optional[str] = None,
                     stage_s: Optional[dict] = None):
        """Coarse quantizer only: train + full-corpus assign + balance.

        Returns (centroids, assign, sample_cache) where sample_cache is
        the (sample, s_off, s_scale, sel) tuple when freshly computed
        (None on a coarse_cache hit). stage_s, when given, receives
        per-stage wall seconds (sample/kmeans/assign/balance) — the
        nlist=2^20 at-scale exercise records these (the reference builds
        1,048,576 coarse clusters, ref: README.md:330).
        """
        import time as _time

        def _mark(key, t0):
            if stage_s is not None:
                stage_s[key] = round(_time.perf_counter() - t0, 2)
            return _time.perf_counter()

        n, d = codes_int8.shape
        if coarse_cache is not None:
            done = os.path.join(coarse_cache, "coarse.done")
            if os.path.exists(done):
                centroids = np.load(os.path.join(coarse_cache,
                                                 "centroids.npy"))
                assign = np.load(os.path.join(coarse_cache, "assign.npy"))
                assert assign.shape[0] == n, "coarse cache is for another corpus"
                # a resumed run still reports the build's wall clocks
                sj = os.path.join(coarse_cache, "stage_s.json")
                if stage_s is not None and os.path.exists(sj):
                    with open(sj) as f:
                        stage_s.update(json.load(f))
                return centroids, assign, None
        # NO build path materializes an O(corpus) float copy: SQ8 reuses
        # the int8 codes; PQ/OPQ train on the int8-resident sample and
        # encode the corpus by STREAMING int8 blocks through the device
        # (dequant + rotate + assign fused on device; see ops/pq.pq_encode)

        t0 = _time.perf_counter()
        sample, s_off, s_scale, s_sel = IVFIndex._train_sample(
            codes_int8, cfg, offset, scale)
        t0 = _mark("sample_s", t0)

        # --- coarse quantizer. Flat Lloyd for moderate nlist; two-level
        # hierarchical k-means at reference scale (nlist up to 2^20,
        # ref: README.md:330) where a flat [N, k] pass is infeasible.
        # Coarse assignment is by L2 (consistent with the k-means objective,
        # so lists stay balanced; the reference's IndexFlatIP add-time
        # assignment is skew-prone when centroids are correlated). Probing
        # remains max-inner-product over centroids (ref: index.py:53,62).
        # Full-corpus passes ship the RAW int8 codes (4x less upload than
        # f32; L2 assignment is affine-equivariant, see ops/kmeans).
        if cfg.num_clusters >= cfg.two_level_clusters:
            # Intermediate checkpoint: the two-level k-means train is the
            # longest single stage (~40 min at 10M); cache it separately so
            # a TPU-worker crash during assignment/balance resumes here.
            km_done = (os.path.join(coarse_cache, "kmeans.done")
                       if coarse_cache is not None else None)
            if km_done is not None and os.path.exists(km_done):
                centroids = np.load(
                    os.path.join(coarse_cache, "km_centroids.npy"))
                l1_cents = np.load(os.path.join(coarse_cache, "km_l1.npy"))
                parent_offs = np.load(
                    os.path.join(coarse_cache, "km_offs.npy"))
            else:
                centroids, l1_cents, parent_offs = kmeans_two_level(
                    sample, cfg.num_clusters, iters=cfg.kmeans_iters,
                    seed=cfg.seed, verbose=verbose, offset=s_off,
                    scale=s_scale)
                if km_done is not None:
                    os.makedirs(coarse_cache, exist_ok=True)
                    np.save(os.path.join(coarse_cache, "km_centroids.npy"),
                            np.asarray(centroids))
                    np.save(os.path.join(coarse_cache, "km_l1.npy"),
                            np.asarray(l1_cents))
                    np.save(os.path.join(coarse_cache, "km_offs.npy"),
                            np.asarray(parent_offs))
                    with open(km_done, "w") as f:
                        f.write("ok\n")
            t0 = _mark("kmeans_s", t0)
            # Full-corpus assignment: device-resident grouped-matmul path
            # when the int8 corpus fits the HBM budget (hours → minutes at
            # 10M+ rows; see ops/kmeans.assign_corpus_hier), else the
            # streamed per-block fallback.
            budget = int(float(os.environ.get(
                "DPH_ASSIGN_DEVICE_BYTES", 9e9)))
            codes_dev = None
            if codes_int8.nbytes <= budget:
                codes_dev = jnp.asarray(np.asarray(codes_int8))

                def assign_fn(l1_, cents_, offs_):
                    return assign_corpus_hier(
                        codes_dev, l1_, cents_, offs_,
                        probe=cfg.assign_probe, offset=offset, scale=scale)
            else:
                # beyond-HBM: stream blocks through the same grouped path
                def assign_fn(l1_, cents_, offs_):
                    return assign_hier_streamed(
                        codes_int8, l1_, cents_, offs_,
                        probe=cfg.assign_probe, offset=offset, scale=scale)

            assign = assign_fn(l1_cents, centroids, parent_offs)
            t0 = _mark("assign_s", t0)
            k_req = centroids.shape[0]
            centroids, _, _, assign = _balance_lists_hier(
                codes_int8, centroids, l1_cents, assign,
                balance_factor=cfg.balance_factor, rounds=3, seed=cfg.seed,
                probe=cfg.assign_probe, verbose=verbose, offset=offset,
                scale=scale, assign_fn=assign_fn,
                growth_cap=cfg.nlist_growth_cap, parent_offs=parent_offs)
            # deterministic backstop: partition any list geometric
            # splitting could not break (tight blobs under bf16 ties),
            # longest first, within the residual growth budget
            fp_budget = (None if cfg.nlist_growth_cap is None else max(
                int(np.ceil(cfg.nlist_growth_cap * k_req))
                - centroids.shape[0], 0))
            centroids, _, assign = _force_partition(
                centroids, assign,
                cfg.balance_factor * max(n / centroids.shape[0], 1.0),
                l1_cents=l1_cents, budget=fp_budget)
            IVFIndex._log_growth(k_req, centroids.shape[0], assign)
            t0 = _mark("balance_s", t0)
            del codes_dev, assign_fn
        else:
            centroids, _ = kmeans(
                sample, cfg.num_clusters, iters=cfg.kmeans_iters,
                seed=cfg.seed, verbose=verbose,
                chunk=min(4096, _round_up(max(len(sample) // 8, 256), 256)),
                offset=s_off, scale=s_scale)
            t0 = _mark("kmeans_s", t0)
            assign = assign_blocks(codes_int8, centroids, chunk=2048,
                                   offset=offset, scale=scale)
            t0 = _mark("assign_s", t0)

            # --- balance: split oversized lists (ε-scaled centroid copies +
            # Lloyd refinement). Bounded list length is what makes the
            # fixed-cap TPU scan bandwidth-efficient (no FAISS analog needed
            # there: CPU scans tolerate ragged lists, our MXU scan wants
            # uniform tiles).
            k_req = centroids.shape[0]
            centroids, assign = _balance_lists(
                codes_int8, centroids, assign,
                balance_factor=cfg.balance_factor, rounds=3, seed=cfg.seed,
                verbose=verbose, offset=offset, scale=scale,
                growth_cap=cfg.nlist_growth_cap)
            fp_budget = (None if cfg.nlist_growth_cap is None else max(
                int(np.ceil(cfg.nlist_growth_cap * k_req))
                - centroids.shape[0], 0))
            centroids, _, assign = _force_partition(
                centroids, assign,
                cfg.balance_factor * max(n / centroids.shape[0], 1.0),
                budget=fp_budget)
            IVFIndex._log_growth(k_req, centroids.shape[0], assign)
            t0 = _mark("balance_s", t0)

        if coarse_cache is not None:
            os.makedirs(coarse_cache, exist_ok=True)
            np.save(os.path.join(coarse_cache, "centroids.npy"),
                    np.asarray(centroids))
            np.save(os.path.join(coarse_cache, "assign.npy"),
                    np.asarray(assign))
            if stage_s:
                with open(os.path.join(coarse_cache, "stage_s.json"),
                          "w") as f:
                    json.dump(stage_s, f)
            with open(os.path.join(coarse_cache, "coarse.done"), "w") as f:
                f.write("ok\n")
        return centroids, assign, (sample, s_off, s_scale, s_sel)

    @staticmethod
    def _train_sample(codes_int8: np.ndarray, cfg: IVFConfig, offset: float,
                      scale: float):
        """Training subsample (ref: build_phrase_index.py:60-93).

        The sample stays in int8 end-to-end (sorted indices → sequential
        memmap reads; no O(sample) f32 materialization — the temp chains
        dominated build time on slow-memory hosts); the k-means stack
        consumes raw codes via the affine contract. Deterministic in
        cfg.seed, so build and _finish_build recompute the same sample.
        """
        n = codes_int8.shape[0]
        rng = np.random.default_rng(cfg.seed)
        if cfg.sample_ratio < 1.0:
            take = max(int(n * cfg.sample_ratio), min(n, cfg.num_clusters * 4))
            sel = np.sort(rng.choice(n, size=min(take, n), replace=False))
        else:
            sel = np.arange(n)
        sample = np.ascontiguousarray(codes_int8[sel])
        s_quant = sample.dtype == np.int8
        s_off, s_scale = (offset, scale) if s_quant else (0.0, 1.0)
        if cfg.norm_th < 999.0:
            # norms on device (one upload, tiny download)
            sv = jnp.asarray(sample)
            norms = np.asarray(jnp.sqrt(jnp.sum(
                (sv.astype(jnp.float32) / s_scale + s_off) ** 2, axis=1)))
            del sv
            kept = norms < cfg.norm_th
            if int(kept.sum()) >= cfg.num_clusters:
                sample, sel = sample[kept], sel[kept]
        return sample, s_off, s_scale, sel

    @staticmethod
    def _finish_build(codes_int8: np.ndarray, cfg: IVFConfig,
                      centroids: np.ndarray, assign: np.ndarray,
                      offset: float, scale: float,
                      verbose: bool = False,
                      sample_cache=None) -> "IVFIndex":
        """Fine quantization + list layout, given a trained coarse quantizer
        (the second half of build; entry point for coarse_cache hits).

        sample_cache: optional (sample, s_off, s_scale, sel) tuple from
        build() — the memmap sample gather costs minutes at 10M rows on
        the slow hosts this targets, so the coarse phase's sample is
        reused rather than re-gathered for PQ/OPQ training."""
        n, d = codes_int8.shape
        # --- fine quantization. Training consumes the int8-resident sample
        # (one upload, dequant on device); the corpus encode streams int8
        # blocks through a fused dequant(+rotate)+assign device pipeline.
        rotation = None
        pq = None
        i4_off, i4_sc = INT4_OFFSET, INT4_SCALE
        fq = cfg.fine_quant
        # residual encoding (FAISS IVFPQ by_residual parity; see IVFConfig).
        # __dict__.get so a legacy unpickled cfg (no instance attr) rebuilds
        # full-vector rather than inheriting the new class default
        pq_spec = parse_pq_quant(fq)
        resid = bool(cfg.__dict__.get("pq_residual", False)) and (
            pq_spec is not None)
        r_cents = np.asarray(centroids, np.float32) if resid else None
        if pq_spec is not None and pq_spec[0] == "OPQ":
            _, m, nbits = pq_spec
            sample, s_off, s_scale, sel = (
                sample_cache or IVFIndex._train_sample(
                    codes_int8, cfg, offset, scale))
            opq = train_opq(sample, m, nbits=nbits, niter=cfg.opq_iters,
                            pq_iters=cfg.pq_iters, seed=cfg.seed,
                            verbose=verbose, offset=s_off, scale=s_scale,
                            sub_cents=r_cents,
                            sub_ids=assign[sel] if resid else None)
            rotation = opq.rotation
            pq = opq.pq
            fine_codes = pq_encode(pq, codes_int8, offset=offset,
                                   scale=scale, rotation=rotation,
                                   cents=r_cents,
                                   assign=assign if resid else None)
            if nbits == 4:
                fine_codes = pack_nibbles(fine_codes)
        elif pq_spec is not None:
            _, m, nbits = pq_spec
            sample, s_off, s_scale, sel = (
                sample_cache or IVFIndex._train_sample(
                    codes_int8, cfg, offset, scale))
            pq = train_pq(sample, m, nbits=nbits, iters=cfg.pq_iters,
                          seed=cfg.seed,
                          offset=s_off, scale=s_scale, sub_cents=r_cents,
                          sub_ids=assign[sel] if resid else None)
            fine_codes = pq_encode(pq, codes_int8, offset=offset,
                                   scale=scale, cents=r_cents,
                                   assign=assign if resid else None)
            if nbits == 4:
                fine_codes = pack_nibbles(fine_codes)
        elif fq == "SQ8":
            fine_codes = codes_int8
        elif fq == "SQ4":
            i4_off, i4_sc = INT4_OFFSET, INT4_SCALE
            if getattr(cfg, "int4_ranges", None) is not None:
                i4_off, i4_sc = cfg.int4_ranges
            elif getattr(cfg, "sq4_train_ranges", True):
                # trained per-dim ranges (FAISS QT_4bit trains vmin/vdiff
                # per dim; ref build_phrase_index.py:103-105): the fixed
                # global affine clips tails / wastes levels — measured
                # +0.16 recall@20 at 10.5M. Quantiles on a bounded
                # subsample of the training sample.
                sample, s_off, s_scale, _ = (
                    sample_cache or IVFIndex._train_sample(
                        codes_int8, cfg, offset, scale))
                sub = np.ascontiguousarray(
                    sample[:: max(len(sample) // 131072, 1)])
                sub_f = (sub.astype(np.float32) / s_scale + s_off
                         if sub.dtype == np.int8 else
                         sub.astype(np.float32))
                i4_off, i4_sc = train_int4_ranges(sub_f)
                del sub, sub_f
            fine_codes = _sq4_encode_stream(codes_int8, offset=offset,
                                            scale=scale,
                                            int4_offset=i4_off,
                                            int4_scale=i4_sc)
        else:
            raise ValueError(f"unknown fine_quant {fq}")

        # --- sort rows by list; contiguous inverted lists
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        list_offsets = np.searchsorted(
            sorted_assign, np.arange(centroids.shape[0] + 1)).astype(np.int32)
        sorted_codes = fine_codes[order]
        # pad with CAP extra rows so dynamic_slice never clamps into data;
        # round the total to the packed scan's 32-row block size
        lens = np.diff(list_offsets)
        cap = int(_round_up(max(int(lens.max()), 8), 8))
        pad = _round_up(cap, PACK_RB) + (-(n + _round_up(cap, PACK_RB))) % PACK_RB
        sorted_codes = np.concatenate(
            [sorted_codes, np.zeros((pad,) + sorted_codes.shape[1:],
                                    sorted_codes.dtype)])
        row_perm = np.concatenate([order, np.zeros(pad, order.dtype)]).astype(np.int64)

        refine = codes_int8 if (pq is not None and cfg.refine_factor > 1) else None
        return IVFIndex(cfg, centroids, row_perm, list_offsets, sorted_codes,
                        rotation=rotation, pq=pq, offset=offset, scale=scale,
                        n_total=n, refine_codes=refine,
                        int4_offset=i4_off, int4_scale=i4_sc)

    @staticmethod
    def build_host_save(codes_int8, cfg: IVFConfig, out_dir: str,
                        offset: float = DEFAULT_OFFSET,
                        scale: float = DEFAULT_SCALE,
                        coarse_cache: Optional[str] = None,
                        verbose: bool = False,
                        chunk_rows: int = 1 << 20) -> str:
        """Beyond-HBM build: train coarse + lay out SQ8 inverted lists and
        write the save directory DIRECTLY, with the sorted code matrix
        streamed memmap→memmap — no corpus-sized device array (the normal
        build uploads the codes at __init__) and no second corpus-sized
        host allocation. Serve the result with TieredIVF.load (the FAISS
        OnDiskInvertedLists role, ref: build_phrase_index.py:282-338).

        SQ8 only: at beyond-HBM scale the raw-code tiered scan is the
        serve path (index/tiered.py rejects PQ by design)."""
        assert cfg.fine_quant == "SQ8", \
            "host-save build is the beyond-HBM SQ8 path (see TieredIVF)"
        n, d = codes_int8.shape
        centroids, assign, _ = IVFIndex.build_coarse(
            codes_int8, cfg, verbose=verbose, coarse_cache=coarse_cache)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        list_offsets = np.searchsorted(
            sorted_assign, np.arange(centroids.shape[0] + 1)).astype(
                np.int32)
        lens = np.diff(list_offsets)
        cap = int(_round_up(max(int(lens.max()), 8), 8))
        pad = (_round_up(cap, PACK_RB)
               + (-(n + _round_up(cap, PACK_RB))) % PACK_RB)
        os.makedirs(out_dir, exist_ok=True)
        mm = np.lib.format.open_memmap(
            os.path.join(out_dir, "codes.npy"), mode="w+", dtype=np.int8,
            shape=(n + pad, d))
        for b0 in range(0, n, chunk_rows):
            b1 = min(b0 + chunk_rows, n)
            mm[b0:b1] = codes_int8[order[b0:b1]]
        mm[n:] = 0
        mm.flush()
        del mm
        np.save(os.path.join(out_dir, "centroids.npy"),
                np.asarray(centroids, np.float32))
        np.save(os.path.join(out_dir, "row_perm.npy"), np.concatenate(
            [order, np.zeros(pad, order.dtype)]).astype(np.int64))
        np.save(os.path.join(out_dir, "list_offsets.npy"), list_offsets)
        extra = {"cfg": cfg, "rotation": None, "pq": None,
                 "offset": float(offset), "scale": float(scale),
                 "n_total": int(n), "int4_offset": INT4_OFFSET,
                 "int4_scale": INT4_SCALE}
        with open(os.path.join(out_dir, "ivf.pkl"), "wb") as f:
            pickle.dump(extra, f)
        return out_dir

    def _scan_contract(self, queries):
        """(q_score, offset, scale) for the union scans.

        SQ8 / legacy-scalar SQ4: identity queries + the scalar affine.
        Trained per-dim SQ4: the score wanted is
        ``sum_d q_d (code_d / scale_d + lo_d)`` — fold the per-dim scale
        into the QUERY (q / scale_vec) and the bias into a vector offset
        (scale_vec * lo_vec, so the scan's (q_score * offset).sum equals
        q·lo), leaving the scan's own scale at 1.0. Probing always uses
        the untransformed queries."""
        if not self.sq4:
            return queries, jnp.float32(self.offset), jnp.float32(self.scale)
        if not self.int4_vector:
            return (queries, jnp.float32(self.int4_offset),
                    jnp.float32(self.int4_scale))
        return (queries / self.int4_scale,
                self.int4_scale * self.int4_offset, jnp.float32(1.0))

    # ------------------------------------------------------- union search
    def search_union(self, queries, top_k: int = 10, nprobe: int = 64,
                     as_numpy: bool = True):
        """Batched union-scan search — the bandwidth-optimal formulation for
        query batches.

        Rationale: the per-probe dynamic-slice scan reads each query's probed
        lists separately, so HBM traffic multiplies by the batch size. But
        within a batch the probed lists overlap heavily; the union scan
        dedupes the probed lists ON DEVICE (sort + sentinel), reads each
        unique list once, scores the whole batch against it with one MXU
        matmul, and masks per query. One jitted dispatch, no host sync.

        Returns (scores [B, K], gids [B, K]) — numpy if as_numpy."""
        if (self.pq_books is not None and self.refine_codes is None
                and self.refine_host is not None):
            # host-tier refine: widened device PQ scan, then exact int8
            # re-rank in numpy over a memmap gather (see __init__ note)
            wide_k = min(top_k * max(self.cfg.refine_factor, 1),
                         max(self.n_total, 1))
            rh = self.refine_host
            self.refine_host = None
            try:
                vals, ids = self.search_union(queries, top_k=wide_k,
                                              nprobe=nprobe, as_numpy=True)
            finally:
                self.refine_host = rh
            q_np = np.asarray(queries, np.float32)
            vals, ids = self._host_refine(q_np, vals, ids, top_k)
            if not as_numpy:
                return jnp.asarray(vals), jnp.asarray(ids)
            return vals, ids
        queries = jnp.asarray(queries, jnp.float32)
        nprobe = min(nprobe, int(self.centroids.shape[0]))
        is_pq = self.pq_books is not None
        q_score, off, sc = self._scan_contract(queries)
        if not is_pq and self.use_packed and self._packed_ok:
            # exact-length block DMA (ops/ivf_pack): HBM traffic ~sum(len)
            # instead of cap × nlists — kills the fixed-cap read amplification
            b = int(queries.shape[0])
            vals, ids = packed_union_scan(
                queries, self.centroids, self.list_offsets, self.codes,
                self.row_perm, off, sc, q_score=q_score,
                top_k=top_k, nprobe=nprobe, cap=self.cap,
                budgets=self._pack_budgets(b, nprobe),
                n_real=self.n_real, sq4=self.sq4,
                interpret=(jax.default_backend() != "tpu"))
        elif is_pq and self.use_packed and self._pq_block_ok:
            b = int(queries.shape[0])
            scan_k = (min(top_k * self.cfg.refine_factor,
                          max(self.n_total, 1))
                      if self.refine_codes is not None
                      else min(top_k, max(self.n_total, 1)))
            q_rot = (queries if self.rotation is None
                     else queries @ self.rotation)
            if self._pq_pallas:
                # Pallas one-hot LUT kernel over the packed block geometry
                # (VMEM-resident LUT, on-chip one-hot — no HBM expansion)
                vals, ids = packed_pq_scan(
                    queries, q_rot, self.centroids, self.list_offsets,
                    self._codes128, self.row_perm, self.pq_books,
                    self.refine_codes, jnp.float32(self.offset),
                    jnp.float32(self.scale),
                    top_k=top_k, nprobe=nprobe, cap=self.cap,
                    budgets=self._pack_budgets(b, nprobe),
                    n_real=self.n_real, scan_k=scan_k,
                    pq_residual=self.pq_residual,
                    interpret=(jax.default_backend() != "tpu"))
            else:
                # pure-XLA PQ block scan: one block gather + fat chunked
                # LUT matmuls instead of ~B*nprobe serial cap-wide steps
                vals, ids = _pq_block_scan(
                    queries, q_rot,
                    self.centroids, self.list_offsets, self.codes,
                    self.row_perm, self.pq_books, self.refine_codes,
                    jnp.float32(self.offset), jnp.float32(self.scale),
                    top_k=top_k, nprobe=nprobe, scan_k=scan_k,
                    budgets=self._pack_budgets(b, nprobe,
                                               smem_clamp=False),
                    n_real=self.n_real, chunk=_pq_chunk(),
                    pq_residual=self.pq_residual)
        else:
            q_rot = (q_score if self.sq4
                     else queries if self.rotation is None
                     else queries @ self.rotation)
            do_refine = is_pq and self.refine_codes is not None
            scan_k = (min(top_k * self.cfg.refine_factor,
                          max(self.n_total, 1))
                      if do_refine else min(top_k, max(self.n_total, 1)))
            # group size: bound the per-step working set (one-hot expansion
            # for PQ, raw int8 rows for SQ8) to keep VMEM pressure flat
            mdim = int(self.codes.shape[1])
            # one-hot expansion bytes per candidate row: M*ksub*2 (bf16)
            oh_row = (int(self.pq_books.shape[0])
                      * int(self.pq_books.shape[1]) * 2) if is_pq else 0
            row_budget = (32 * 1024 * 1024 // max(oh_row, 1) if is_pq
                          else 8 * 1024 * 1024 // max(mdim, 1))
            group = int(np.clip(row_budget // max(self.cap, 1), 1, 64))
            vals, ids = _union_scan(
                queries, q_rot, self.centroids, self.list_offsets,
                self.codes, self.row_perm, self.pq_books, self.refine_codes,
                off, sc, top_k=top_k,
                nprobe=nprobe, cap=self.cap, group=group, scan_k=scan_k,
                sq4=self.sq4, pq_residual=self.pq_residual)
        if vals.shape[1] < top_k:  # corpus smaller than top_k: pad
            pad = top_k - vals.shape[1]
            vals = jnp.concatenate(
                [vals, jnp.full((vals.shape[0], pad), NEG_INF)], 1)
            ids = jnp.concatenate(
                [ids, jnp.zeros((ids.shape[0], pad), ids.dtype)], 1)
        if as_numpy:
            return np.asarray(vals), np.asarray(ids)
        return vals, ids

    # ------------------------------------------------------------- search
    def search(self, queries, top_k: int = 10, nprobe: int = 64,
               as_numpy: bool = True):
        """queries [B, D] f32 → (scores [B, K], global ids [B, K]).
        as_numpy=False keeps results on device.

        Batches of ≥ prefer_union_batch queries route to the union-scan
        formulation (one shared candidate gather for the whole batch)."""
        queries = jnp.asarray(queries, jnp.float32)
        # SQ4 lists only exist in the union-scan formulations (the per-probe
        # scan never learned to unpack nibbles — by design: single queries
        # route through the packed scan just as efficiently). PQ also
        # always routes to the union scan: the per-probe PQ path expands a
        # [B, cap, M, 256] one-hot whose size is unbounded in the list cap
        # (11.7 GB at cap 2377 / OPQ96 — a device-killing allocation); the
        # union scan bounds the expansion per group instead.
        if (self.sq4 or self.pq_books is not None
                or queries.shape[0] >= getattr(self.cfg,
                                               "prefer_union_batch", 4)):
            return self.search_union(queries, top_k=top_k, nprobe=nprobe,
                                     as_numpy=as_numpy)
        nprobe = min(nprobe, int(self.centroids.shape[0]))
        k = min(top_k, self.n_total)
        key = (k, nprobe)
        if key not in self._search_cache:
            self._search_cache[key] = self._build_search(k, nprobe)
        vals, ids = self._search_cache[key](queries)
        if k < top_k:
            pad = top_k - k
            vals = jnp.concatenate(
                [vals, jnp.full((vals.shape[0], pad), NEG_INF)], 1)
            ids = jnp.concatenate(
                [ids, jnp.zeros((ids.shape[0], pad), ids.dtype)], 1)
        if as_numpy:
            return np.asarray(vals), np.asarray(ids)
        return vals, ids

    def _build_search(self, top_k: int, nprobe: int):
        scan_k = (min(top_k * self.cfg.refine_factor, self.n_total)
                  if (self.pq_books is not None
                      and self.refine_codes is not None) else top_k)
        rotation = self.rotation

        def searcher(queries):
            return _probe_score(
                queries,
                queries if rotation is None else queries @ rotation,
                self.centroids, self.list_offsets, self.codes,
                self.row_perm, self.pq_books, self.refine_codes,
                jnp.float32(self.offset), jnp.float32(self.scale),
                top_k=top_k, nprobe=nprobe, cap=self.cap, scan_k=scan_k,
                pq_residual=self.pq_residual)

        return searcher

    def _host_refine(self, q: np.ndarray, vals: np.ndarray,
                     gids: np.ndarray, top_k: int):
        """Exact int8 re-rank of PQ candidates against the host-memmapped
        original-order matrix (the FAISS-CPU refine step, host-side;
        counterpart of the device refine in the scans)."""
        rh = self.refine_host
        n = rh.shape[0]
        g = np.clip(np.asarray(gids, np.int64), 0, n - 1)
        rows = np.asarray(rh[g.reshape(-1)], np.float32).reshape(
            g.shape + (rh.shape[1],))
        qsum = q.sum(-1) * self.offset
        s = (np.einsum("bkd,bd->bk", rows, q, optimize=True) / self.scale
             + qsum[:, None])
        s = np.where(np.asarray(vals) > NEG_INF / 2, s, NEG_INF)
        k = min(top_k, s.shape[1])
        sel = np.argpartition(-s, k - 1, axis=1)[:, :k]
        sv = np.take_along_axis(s, sel, axis=1)
        order = np.argsort(-sv, axis=1)
        sel = np.take_along_axis(sel, order, axis=1)
        return (np.take_along_axis(s, sel, axis=1),
                np.take_along_axis(np.asarray(gids), sel, axis=1))

    def _pack_budgets(self, b: int, nprobe: int, smem_clamp: bool = True):
        """Static block-budget tiers for the packed scan at batch/probe
        shape (b, nprobe).

        The WORST case (sum of the U = b*nprobe longest lists' block
        counts) is what correctness needs, but after balancing the long
        tail makes it ~3-4x the typical batch's actual block total — and
        the scan's grid, score buffer, and top-k all scale with the
        budget. So a SMALL tier sized from the mean blocks-per-list (x a
        1.35 safety factor) is compiled alongside it; packed_union_scan
        selects by lax.cond on the actual total. Both tiers round up to
        64 blocks (the two-stage top-k's 2048-column segment).

        smem_clamp=True applies the Pallas scan's SMEM block-table ceiling
        to the guard tier; the pure-XLA _pq_block_scan has no such
        constraint and passes False for an exact worst case."""
        u_cap = min(b * nprobe, int(self.centroids.shape[0]))
        worst = _round_up(max(int(self._pack_table[u_cap - 1]),
                              PACK_TPB), 64)
        small = _round_up(
            max(int(np.ceil(u_cap * self._pack_mean_blk * 1.35)), PACK_TPB),
            64)
        if smem_clamp:
            # SMEM ceiling: the block table scalar-prefetches into SMEM
            # (~1 MB on v5e); tables beyond ~768 KB fail to compile. The
            # worst-case tier is clipped to the ceiling — at probe counts
            # where the true worst case exceeds it, coverage truncates at
            # the ceiling (only reachable when a batch's probed lists are
            # pathologically long; packed_union_scan emits a debug print
            # when that actually happens so truncation is observable).
            smem_max = int(os.environ.get("DPH_PACK_SMEM_BLOCKS",
                                          160 * 1024))
            worst = min(worst, _round_up(smem_max, 64))
        small = min(small, worst)
        tiers = []
        if small < int(0.75 * worst):
            tiers.append(small)
            if small * 2 < int(0.75 * worst):
                tiers.append(_round_up(small * 2, 64))
        tiers.append(worst)  # the guard tier: always compiled last
        return tuple(dict.fromkeys(tiers))

    # ------------------------------------------------------------- io
    # --------------------------------------------------- bench harness
    def bench_union_repeat(self, queries, top_k: int = 20, nprobe: int = 64,
                           reps: int = 16, packed: Optional[bool] = None):
        """Dispatch-amortized union-scan timing: run ``reps`` perturbed
        scans inside ONE jitted fori_loop and return a scalar checksum
        (a device array — fetch it and divide the wall time by reps).

        On high-latency links (the dev tunnel: ~30-60 ms per round trip)
        per-call value-fetch timing cannot resolve sub-10-ms scans; this
        amortizes one dispatch + one fetch over the whole loop. Queries
        are perturbed per iteration so CSE cannot collapse the loop body.
        ``packed`` pins the scan formulation (None = the search default).
        """
        queries = jnp.asarray(queries, jnp.float32)
        nprobe = min(nprobe, int(self.centroids.shape[0]))
        # packed=False pins the grouped fixed-cap formulation (the read-
        # amplification comparison) for BOTH the raw-code Pallas packed
        # scan and the PQ block scan
        force_grouped = packed is False
        if packed is None or self.pq_books is not None:
            packed = (self.pq_books is None and self.use_packed
                      and self._packed_ok and not force_grouped)
        qs_bench, off, sc = self._scan_contract(queries)
        del qs_bench  # recomputed per perturbed query inside the loop
        b = int(queries.shape[0])
        key = ("bench_union", bool(packed), force_grouped, top_k, nprobe,
               reps, b)
        run = self._search_cache.get(key)
        if run is None:
            # every device array is a jit ARGUMENT: closing over multi-GB
            # buffers captures them as HLO constants, which remote
            # compilers reject outright
            interp = jax.default_backend() != "tpu"
            cap, sq4, rotation = self.cap, self.sq4, self.rotation
            # per-dim trained int4: fold the scale vector into the query
            # (see _scan_contract); the [D] constants are tiny closures
            i4_vec = sq4 and self.int4_vector
            i4_scale = self.int4_scale if i4_vec else None
            if packed:
                budgets = self._pack_budgets(b, nprobe)
                n_real = self.n_real

                def one(q, cents, loffs, codes, perm, books, refine):
                    qs = q / i4_scale if i4_vec else None
                    return packed_union_scan(
                        q, cents, loffs, codes, perm, off,
                        sc, q_score=qs, top_k=top_k, nprobe=nprobe,
                        cap=cap, budgets=budgets, n_real=n_real, sq4=sq4,
                        interpret=interp)
            else:
                is_pq = self.pq_books is not None
                do_refine = is_pq and self.refine_codes is not None
                scan_k = (min(top_k * self.cfg.refine_factor,
                              max(self.n_total, 1))
                          if do_refine else min(top_k, max(self.n_total, 1)))
                mdim = int(self.codes.shape[1])
                oh_row = (int(self.pq_books.shape[0])
                          * int(self.pq_books.shape[1]) * 2) if is_pq else 0
                row_budget = (32 * 1024 * 1024 // max(oh_row, 1) if is_pq
                              else 8 * 1024 * 1024 // max(mdim, 1))
                group = int(np.clip(row_budget // max(cap, 1), 1, 64))
                use_pq_block = (is_pq and self.use_packed
                                and self._pq_block_ok and not force_grouped)
                use_pq_pallas = use_pq_block and self._pq_pallas
                budgets = (self._pack_budgets(
                    b, nprobe, smem_clamp=use_pq_pallas)
                    if use_pq_block else ())
                n_real, pq_res = self.n_real, self.pq_residual
                interp = jax.default_backend() != "tpu"

                def one(q, cents, loffs, codes, perm, books, refine):
                    if i4_vec:
                        q_rot = q / i4_scale
                    else:
                        q_rot = q if rotation is None else q @ rotation
                    if use_pq_pallas:
                        return packed_pq_scan(
                            q, q_rot, cents, loffs, codes, perm, books,
                            refine, off, sc, top_k=top_k, nprobe=nprobe,
                            cap=cap, budgets=budgets, n_real=n_real,
                            scan_k=scan_k, pq_residual=pq_res,
                            interpret=interp)
                    if use_pq_block:
                        return _pq_block_scan(
                            q, q_rot, cents, loffs, codes, perm, books,
                            refine, off, sc, top_k=top_k, nprobe=nprobe,
                            scan_k=scan_k, budgets=budgets, n_real=n_real,
                            chunk=_pq_chunk(), pq_residual=pq_res)
                    return _union_scan(
                        q, q_rot, cents, loffs, codes, perm, books, refine,
                        off, sc, top_k=top_k,
                        nprobe=nprobe, cap=cap, group=group, scan_k=scan_k,
                        sq4=sq4, pq_residual=self.pq_residual)

            @jax.jit
            def run(q, cents, loffs, codes, perm, books, refine):
                def body(i, acc):
                    v, g = one(q + i.astype(jnp.float32) * 1e-4, cents,
                               loffs, codes, perm, books, refine)
                    return acc + v.sum() + g.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            self._search_cache[key] = run
        codes_arg = (self._codes128
                     if (self.pq_books is not None and self._pq_pallas
                         and self.use_packed and self._pq_block_ok
                         and not force_grouped)
                     else self.codes)
        return run(queries, self.centroids, self.list_offsets, codes_arg,
                   self.row_perm, self.pq_books, self.refine_codes)

    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "centroids.npy"), np.asarray(self.centroids))
        np.save(os.path.join(path, "row_perm.npy"), np.asarray(self.row_perm))
        np.save(os.path.join(path, "list_offsets.npy"), np.asarray(self.list_offsets))
        host = getattr(self, "_host_arrays", {})
        np.save(os.path.join(path, "codes.npy"),
                host["codes"] if "codes" in host else np.asarray(self.codes))
        if self.refine_codes is not None:
            np.save(os.path.join(path, "refine_codes.npy"),
                    host["refine"] if "refine" in host
                    else np.asarray(self.refine_codes))
        self._host_arrays = {}
        extra = {"cfg": self.cfg, "rotation": None if self.rotation is None
                 else np.asarray(self.rotation),
                 "pq": self.pq, "offset": self.offset, "scale": self.scale,
                 "n_total": self.n_total,
                 "int4_offset": (np.asarray(self.int4_offset)
                                 if self.int4_vector else self.int4_offset),
                 "int4_scale": (np.asarray(self.int4_scale)
                                if self.int4_vector else self.int4_scale)}
        with open(os.path.join(path, "ivf.pkl"), "wb") as f:
            pickle.dump(extra, f)

    @staticmethod
    def load(path: str, drop_refine: bool = False,
             refine_mode: str = "device") -> "IVFIndex":
        """refine_mode:
        - "device": int8 refine matrix uploaded to HBM (the default);
        - "none" (or drop_refine=True): no refine anywhere — pure PQ
          ranking, reconstruct-from-codes serve (MIPS pq_serve; ref faiss
          reconstruct() serving, index.py:275-302);
        - "host": refine stays a host memmap; the exact re-rank runs in
          numpy over a B x scan_k gather per batch — recall of the device
          refine at ~code-bytes device footprint."""
        if drop_refine:
            refine_mode = "none"
        with open(os.path.join(path, "ivf.pkl"), "rb") as f:
            extra = pickle.load(f)
        refine_path = os.path.join(path, "refine_codes.npy")
        # big arrays load memory-mapped: the device upload streams from
        # disk and nothing is pinned in host RSS
        have = os.path.exists(refine_path)
        refine = (np.load(refine_path, mmap_mode="r")
                  if have and refine_mode == "device" else None)
        refine_host = (np.load(refine_path, mmap_mode="r")
                       if have and refine_mode == "host" else None)
        return IVFIndex(
            extra["cfg"],
            np.load(os.path.join(path, "centroids.npy")),
            np.load(os.path.join(path, "row_perm.npy")),
            np.load(os.path.join(path, "list_offsets.npy")),
            np.load(os.path.join(path, "codes.npy"), mmap_mode="r"),
            rotation=extra["rotation"], pq=extra["pq"],
            offset=extra["offset"], scale=extra["scale"],
            n_total=extra["n_total"], refine_codes=refine,
            int4_offset=extra.get("int4_offset", INT4_OFFSET),
            int4_scale=extra.get("int4_scale", INT4_SCALE),
            refine_host=refine_host,
        )


