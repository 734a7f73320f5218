"""Host-tiered exact MIPS — serve corpora larger than one chip's HBM.

The reference serves its 60–74 GB index from host RAM / on-disk FAISS
invlists (ref: densephrases/index.py:28-30 IO_FLAG_ONDISK_SAME_DIR;
build_phrase_index.py:282-338 OnDiskInvertedLists). The TPU equivalent is a
two-tier scan:

- **resident tier**: as many corpus rows as an HBM budget allows live on
  device permanently and are scanned with the chunked MXU scan
  (index/flat.py:_scan_topk).
- **overflow tier**: the rest stays in the memory-mapped store file; at
  query time fixed-size row blocks stream host→device, are scored for the
  WHOLE query batch, and only each block's top-k survives on device. Upload
  of block i+1 overlaps the (async-dispatched) scoring of block i — the
  scan is bandwidth-bound, compute rides along free.

Per-tier candidates merge exactly on device. Host RSS stays O(one block):
the memmap pages stream through the page cache, nothing is ever
materialized corpus-sized on the host.
"""

from __future__ import annotations

import functools
import logging
import mmap
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.index.flat import _round_up, _scan_topk
from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE
from densephrases_tpu.ops.topk import topk_merge

logger = logging.getLogger(__name__)

NEG_INF = jnp.float32(-1e30)


@functools.partial(jax.jit, static_argnames=("top_k",))
def _score_block(qbf, qsum, block, n_valid, scale, *, top_k: int):
    """Score one streamed overflow block for the whole query batch.

    qbf: [B, D] bf16 queries; qsum: [B] rank-1 dequant correction
    (offset * sum(q)); block: [R, D] int8; n_valid: rows beyond are padding.
    Returns (vals [B, K], local ids [B, K] int32)."""
    s = jax.lax.dot_general(
        qbf, block.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s / scale + qsum[:, None]
    cols = jnp.arange(block.shape[0], dtype=jnp.int32)[None, :]
    s = jnp.where(cols < n_valid, s, NEG_INF)
    k = min(top_k, block.shape[0])
    vals, ids = jax.lax.top_k(s, k)
    return vals, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("top_k",))
def _merge_candidates(vals, ids, *, top_k: int):
    """vals/ids: [B, C] concatenated per-tier/per-block candidates."""
    return topk_merge(vals[:, None, :], ids[:, None, :], top_k)


class TieredFlatIndex:
    """Exact MIPS over an int8 corpus split between HBM and host memmap.

    codes: [N, D] int8 — typically ``PhraseStore.load(path, mmap=True).vecs``.
    hbm_budget_bytes: resident-tier size cap (device buffer bytes).
    block_rows: overflow streaming granularity (rows per host→device upload).
    """

    def __init__(self, codes, offset: float = DEFAULT_OFFSET,
                 scale: float = DEFAULT_SCALE, *,
                 hbm_budget_bytes: int = 8 << 30,
                 block_rows: int = 1 << 20,
                 chunk: int = 4096):
        assert codes.dtype == np.int8
        self.n_total, self.dim = codes.shape
        self.offset = float(offset)
        self.scale = float(scale)
        self.mesh = None  # API parity with FlatIndex
        self.quant = "int8"

        max_resident = max(int(hbm_budget_bytes // self.dim), 0)
        chunk = min(chunk, max(8, _round_up(max(self.n_total, 1), 8)))
        self.chunk = chunk
        n_resident = min(self.n_total, max_resident)
        n_resident = (n_resident // chunk) * chunk  # whole chunks only
        if n_resident == 0 and self.n_total > 0 and max_resident >= self.n_total:
            n_resident = self.n_total
        self.n_resident = n_resident
        self.block_rows = int(block_rows)

        if n_resident > 0:
            rows = _round_up(n_resident, chunk)
            padded = np.zeros((rows, self.dim), np.int8)
            padded[:n_resident] = np.asarray(codes[:n_resident])
            self.codes = jax.device_put(padded)  # resident tier (shared w/ rescore)
        else:
            self.codes = None
        self._overflow = codes  # keep the memmap; slices page in on demand
        logger.info(
            "tiered index: %d rows resident (%.2f GB HBM), %d rows host-tier",
            n_resident, n_resident * self.dim / 2**30, self.n_total - n_resident)

    def search(self, queries, top_k: int = 10, nprobe: int = 0,
               as_numpy: bool = True):
        """queries: [B, D] f32 → (scores [B, K], global row ids [B, K]).
        nprobe accepted for API uniformity and ignored (exact scan)."""
        queries = jnp.asarray(queries, jnp.float32)
        k = min(top_k, max(self.n_total, 1))
        qsum = queries.sum(-1) * self.offset
        qbf = queries.astype(jnp.bfloat16)

        cand_vals = []
        cand_ids = []
        if self.n_resident > 0:
            vals, ids = _scan_topk(
                queries, self.codes, jnp.int32(self.n_resident),
                self.offset, self.scale,
                top_k=min(k, self.n_resident), chunk=self.chunk)
            cand_vals.append(vals)
            cand_ids.append(ids)  # int32: single-chip corpus < 2^31 rows

        n_over = self.n_total - self.n_resident
        if n_over > 0:
            br = self.block_rows
            n_blocks = (n_over + br - 1) // br
            # pre-issue the first upload, then overlap upload(i+1) w/ score(i)
            nxt = self._upload_block(0)
            for i in range(n_blocks):
                block, n_valid = nxt
                nxt = self._upload_block(i + 1) if i + 1 < n_blocks else None
                vals, ids = _score_block(qbf, qsum, block, n_valid,
                                         jnp.float32(self.scale),
                                         top_k=min(k, br))
                base = self.n_resident + i * br
                cand_vals.append(vals)
                cand_ids.append(ids + jnp.int32(base))

        all_vals = jnp.concatenate(cand_vals, axis=1)
        all_ids = jnp.concatenate(cand_ids, axis=1)
        vals, ids = _merge_candidates(all_vals, all_ids, top_k=k)
        if k < top_k:
            pad = top_k - k
            vals = jnp.concatenate(
                [vals, jnp.full((vals.shape[0], pad), NEG_INF)], -1)
            ids = jnp.concatenate(
                [ids, jnp.zeros((ids.shape[0], pad), ids.dtype)], -1)
        if as_numpy:
            return np.asarray(vals), np.asarray(ids)
        return vals, ids

    def _upload_block(self, i: int):
        """device_put one overflow block (async); returns (block, n_valid)."""
        br = self.block_rows
        lo = self.n_resident + i * br
        hi = min(lo + br, self.n_total)
        rows = np.asarray(self._overflow[lo:hi])
        n_valid = rows.shape[0]
        if n_valid < br:  # pad the tail block to the static jit shape
            rows = np.concatenate(
                [rows, np.zeros((br - n_valid, self.dim), np.int8)])
        return jax.device_put(rows), jnp.int32(n_valid)

    # -- position-addressable access for the rescore stage ------------------
    def gather_rows_host(self, gids: np.ndarray) -> np.ndarray:
        """int8 rows for arbitrary global ids (host memmap gather) — used by
        the tiered rescore path (B·K·L rows, tiny)."""
        return np.asarray(self._overflow[np.clip(gids, 0, self.n_total - 1)])


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _probe_topk(q, centroids, *, nprobe: int):
    """Coarse probe in ONE compiled program (eager einsum + eager top_k
    cost ~1.7 s/batch of per-op dispatch over the tunnel backend)."""
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), centroids.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _, ids = jax.lax.top_k(s, nprobe)
    return ids


@functools.partial(jax.jit, static_argnames=("top_k", "sq4"))
def _score_union_block(qbf, qsum, block, row_valid, scale,
                       *, top_k: int, sq4: bool = False):
    """Score one streamed union block of inverted-list rows for the whole
    batch — UNION semantics: every query scores the batch's whole
    probed-list union (a candidate superset of its own probed lists),
    exactly like the in-HBM packed scans (ops/ivf_pack). The per-query
    membership mask this kernel once applied was a [B, R] device gather
    measured at 70 ms per 64k-row block (vs 0.06 ms unmasked) — it
    DOMINATED the beyond-HBM serve and only ever removed candidates.

    block: [R, D] int8; row_valid: [R] int32, >= 0 for real rows, -1 for
    tail padding."""
    if sq4:
        # packed nibbles (ops/quant.float_to_int4): high nibble = first
        # half of the feature dim; scale/qsum carry the INT4 affine
        v = block.astype(jnp.int32) & 0xFF
        block = jnp.concatenate([v >> 4, v & 0xF], axis=-1)
    s = jax.lax.dot_general(
        qbf, block.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s / scale + qsum[:, None]
    s = jnp.where((row_valid >= 0)[None, :], s, NEG_INF)
    vals, ids = jax.lax.top_k(s, min(top_k, s.shape[1]))
    return vals, ids.astype(jnp.int32)


class TieredIVF:
    """IVF whose inverted lists live on the HOST (memmap) — the TPU analog
    of FAISS OnDiskInvertedLists (ref: build_phrase_index.py:282-338,
    index.py:28-30 IO_FLAG_ONDISK_SAME_DIR): serve an index bigger than
    device memory.

    Only the coarse centroids are device-resident. Per batch: probe on
    device, read the probed lists' contiguous byte ranges from the memmap
    (one slice per unique list — the exact IO pattern of on-disk invlists),
    stream them up in fixed-size blocks, score on device (union semantics:
    each query scores the batch's whole probed-list union, a candidate
    superset — same contract as the in-HBM packed scans), merge top-k.
    One small device→host sync per batch (the probe ids) is inherent to
    host-side IO — the reference pays the same to read its mmap'd lists.

    Raw-code lists only — SQ8, or SQ4 packed nibbles (scored with the INT4
    affine; ref QT_4bit, build_phrase_index.py:103-105). PQ is rejected:
    the beyond-HBM regime wants the refine-free path, and PQ fits HBM at
    these scales anyway (96 B/vec ≈ 10x smaller)."""

    def __init__(self, centroids, list_offsets, codes_sorted, row_perm,
                 offset: float = DEFAULT_OFFSET, scale: float = DEFAULT_SCALE,
                 block_rows: int = 1 << 18, sq4: bool = False,
                 int4_offset: float = None, int4_scale: float = None):
        from densephrases_tpu.ops.quant import INT4_OFFSET, INT4_SCALE

        self.centroids = jax.device_put(jnp.asarray(centroids, jnp.float32))
        self.list_offsets = np.asarray(list_offsets)  # host: drives the IO
        self._codes = codes_sorted  # host memmap [N_pad, D] int8 (or packed
        # nibbles [N_pad, D/2] when sq4 — scored with the INT4 affine)
        self._row_perm = np.asarray(row_perm)
        self.offset = float(offset)
        self.scale = float(scale)
        self.sq4 = bool(sq4)
        i4o = INT4_OFFSET if int4_offset is None else int4_offset
        i4s = INT4_SCALE if int4_scale is None else int4_scale
        # scalar = fixed legacy contract; [D] vectors = trained per-dim
        # ranges (ops/quant.train_int4_ranges)
        self.int4_vector = np.ndim(i4o) > 0
        self.int4_offset = np.asarray(i4o, np.float32) if self.int4_vector \
            else float(i4o)
        self.int4_scale = np.asarray(i4s, np.float32) if self.int4_vector \
            else float(i4s)
        self.block_rows = int(block_rows)
        self.nlist = int(self.list_offsets.shape[0] - 1)
        self.n_total = int(self.list_offsets[-1])
        # original-order vectors for the rescore stage (usually the phrase
        # store's memmap); without it, gathers go through the inverse perm
        self.store_vecs = None
        self._inv_perm = None

    @staticmethod
    def load(path: str, block_rows: int = 1 << 18) -> "TieredIVF":
        """Open a saved IVFIndex directory with the codes memory-mapped."""
        import json as _json
        import os
        import pickle

        with open(os.path.join(path, "ivf.pkl"), "rb") as f:
            extra = pickle.load(f)
        assert extra["pq"] is None, \
            "TieredIVF serves raw-code (SQ8/SQ4) lists, not PQ (see doc)"
        sq4 = getattr(extra["cfg"], "fine_quant", "SQ8") == "SQ4"
        codes = np.load(os.path.join(path, "codes.npy"), mmap_mode="r")
        return TieredIVF(
            np.load(os.path.join(path, "centroids.npy")),
            np.load(os.path.join(path, "list_offsets.npy")),
            codes,
            np.load(os.path.join(path, "row_perm.npy")),
            offset=extra["offset"], scale=extra["scale"],
            block_rows=block_rows, sq4=sq4,
            int4_offset=extra.get("int4_offset"),
            int4_scale=extra.get("int4_scale"))

    @staticmethod
    def from_index(ivf, block_rows: int = 1 << 18) -> "TieredIVF":
        """Wrap an in-memory IVFIndex (host copies of its arrays)."""
        assert ivf.pq is None, \
            "TieredIVF serves raw-code (SQ8/SQ4) lists, not PQ (see doc)"
        return TieredIVF(np.asarray(ivf.centroids),
                         np.asarray(ivf.list_offsets),
                         np.asarray(ivf.codes), np.asarray(ivf.row_perm),
                         offset=ivf.offset, scale=ivf.scale,
                         block_rows=block_rows, sq4=ivf.sq4,
                         int4_offset=ivf.int4_offset,
                         int4_scale=ivf.int4_scale)

    def gather_rows_host(self, gids: np.ndarray) -> np.ndarray:
        """int8 rows in the STORE affine for ORIGINAL global ids (MIPS
        tiered-rescore hook)."""
        gids = np.clip(gids, 0, self.n_total - 1)
        if self.store_vecs is not None:
            return np.asarray(self.store_vecs[gids])
        if self._inv_perm is None:  # sorted codes → invert the permutation
            inv = np.empty(self.n_total, np.int64)
            inv[self._row_perm[:self.n_total]] = np.arange(self.n_total)
            self._inv_perm = inv
        rows = np.asarray(self._codes[self._inv_perm[gids]])
        if self.sq4:
            # the rescore contract is int8 in the store affine: unpack the
            # nibbles and re-express the int4 codes as int8 codes (a tiny
            # B*K gather — host math is fine)
            v = rows.astype(np.int32) & 0xFF
            i4 = np.concatenate([v >> 4, v & 0xF], axis=-1)
            f = i4.astype(np.float32) / self.int4_scale + self.int4_offset
            rows = np.clip(np.round((f - self.offset) * self.scale),
                           -128, 127).astype(np.int8)
        return rows

    def _advise_ranges(self, starts, ends) -> None:
        """madvise(WILLNEED) every probed byte range up front so the kernel
        queues the reads in parallel. The cold scattered-read pattern is
        IOPS-bound (~30 serial reads/s measured on this host's virtio disk
        = 5 MB/s); advising all ranges first lets readahead overlap them."""
        mm = getattr(self._codes, "_mmap", None)
        if mm is None:
            return
        try:
            page = mmap.PAGESIZE
            base = self._codes.offset
            rb = self._codes.shape[1] * self._codes.dtype.itemsize
            for s0, e0 in zip(starts, ends):
                lo = (base + int(s0) * rb) // page * page
                hi = base + int(e0) * rb
                mm.madvise(mmap.MADV_WILLNEED, lo, hi - lo)
        except (AttributeError, ValueError, OSError):
            pass  # madvise is an optimization only

    def search(self, queries, top_k: int = 10, nprobe: int = 64,
               as_numpy: bool = True):
        prof = os.environ.get("DPH_TIERED_PROFILE") == "1"
        tp0 = time.perf_counter()
        queries = jnp.asarray(queries, jnp.float32)
        b = queries.shape[0]
        nprobe = min(nprobe, self.nlist)
        k = min(top_k, max(self.n_total, 1))

        # ---- probe on device (one jitted program), small download
        probe_np = np.asarray(
            _probe_topk(queries, self.centroids, nprobe=nprobe))
        t_probe = time.perf_counter() - tp0

        # ---- host IO: contiguous range per unique probed list
        offs = self.list_offsets
        uniq = np.unique(probe_np.reshape(-1))
        starts, ends = offs[uniq], offs[uniq + 1]
        lens = ends - starts
        self._advise_ranges(starts, ends)

        if self.sq4 and self.int4_vector:
            # trained per-dim contract: fold the scale vector into the
            # query, the per-dim bias into qsum; block scale stays 1.0
            i4s = jnp.asarray(self.int4_scale)
            q_sc = queries / i4s
            qsum = (q_sc * (i4s * jnp.asarray(self.int4_offset))).sum(-1)
            qbf = q_sc.astype(jnp.bfloat16)
            sc = 1.0
        else:
            off, sc = ((self.int4_offset, self.int4_scale) if self.sq4
                       else (self.offset, self.scale))
            qsum = queries.sum(-1) * off
            qbf = queries.astype(jnp.bfloat16)
        # ---- stream blocks up and score, fully pipelined: per-block
        # results stay ON DEVICE (one fetch at the end), host buffers
        # rotate through a small pool so block i+1's IO/memcpy overlaps
        # block i's (async-dispatched) upload + scan. The old version
        # fetched every block's top-k synchronously, serializing
        # IO -> H2D -> MXU -> D2H per block.
        br = self.block_rows
        ncols = self._codes.shape[1]
        pool = 4
        bufs = [(np.empty((br, ncols), np.int8), np.empty((br,), np.int32))
                for _ in range(pool)]
        dev_vals, dev_ids, blk_rows_l = [], [], []
        blk_rows = np.empty((br,), np.int64)
        fill = 0
        io_s = h2d_s = 0.0
        sc_dev = jnp.float32(sc)

        def flush(fill):
            nonlocal h2d_s
            if fill == 0:
                return
            blk, blk_list = bufs[len(dev_vals) % pool]
            if fill < br:  # pad tail to the static shape
                blk_list[fill:] = -1
            t0 = time.perf_counter()
            blk_dev = jax.device_put(blk)
            list_dev = jax.device_put(blk_list)
            h2d_s += time.perf_counter() - t0
            vals, ids = _score_union_block(
                qbf, qsum, blk_dev, list_dev,
                sc_dev, top_k=min(k, br), sq4=self.sq4)
            dev_vals.append(vals)
            dev_ids.append(ids)
            blk_rows_l.append(blk_rows.copy())

        for s0, ln in zip(starts, lens):
            done = 0
            while done < ln:
                if fill == 0 and len(dev_vals) >= pool:
                    # reusing a pool buffer: its upload must be consumed
                    dev_vals[len(dev_vals) - pool].block_until_ready()
                blk, blk_list = bufs[len(dev_vals) % pool]
                take = min(int(ln - done), br - fill)
                t0 = time.perf_counter()
                blk[fill:fill + take] = self._codes[s0 + done:s0 + done + take]
                io_s += time.perf_counter() - t0
                blk_rows[fill:fill + take] = np.arange(
                    s0 + done, s0 + done + take)
                blk_list[fill:fill + take] = 0  # valid row (-1 = pad)
                fill += take
                done += take
                if fill == br:
                    flush(fill)
                    fill = 0
        flush(fill)

        if not dev_vals:  # empty probe set (degenerate corpus)
            vals = np.full((b, top_k), float(NEG_INF), np.float32)
            return vals, np.zeros((b, top_k), np.int64)

        t0 = time.perf_counter()
        vals_np = [np.asarray(v) for v in dev_vals]
        ids_np = [np.asarray(i) for i in dev_ids]
        fetch_s = time.perf_counter() - t0
        all_vals = np.concatenate(vals_np, axis=1)
        all_rows = np.concatenate(
            [rw[np.clip(i, 0, br - 1)]
             for rw, i in zip(blk_rows_l, ids_np)], axis=1)
        if prof:
            self.last_profile = {
                "probe_s": round(t_probe, 3), "io_s": round(io_s, 3),
                "h2d_s": round(h2d_s, 3), "fetch_s": round(fetch_s, 3),
                "blocks": len(dev_vals), "rows": int(lens.sum()),
                "uniq_lists": int(len(uniq)),
                "total_s": round(time.perf_counter() - tp0, 3)}
        # final exact merge on host (candidate set is small: blocks x k)
        order = np.argsort(-all_vals, axis=1)[:, :k]
        vals = np.take_along_axis(all_vals, order, axis=1)
        rows = np.take_along_axis(all_rows, order, axis=1)
        gids = self._row_perm[np.clip(rows, 0, len(self._row_perm) - 1)]
        if k < top_k:
            pad = top_k - k
            vals = np.concatenate(
                [vals, np.full((b, pad), float(NEG_INF), np.float32)], 1)
            gids = np.concatenate([gids, np.zeros((b, pad), gids.dtype)], 1)
        if as_numpy:
            return vals, gids
        return jnp.asarray(vals), jnp.asarray(gids)
