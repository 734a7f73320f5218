"""Flat (exact) MIPS over the int8 phrase store.

Replaces FAISS ``IndexFlatIP`` search (the reference's ``fine_quant='none'``
path, ref: build_phrase_index.py:117-118, index.py:189-202) with an on-device
engine:

- The int8 corpus lives in TPU HBM, sharded along rows across the mesh.
- Scoring dequantizes on the fly *inside the matmul*:
  ``q · (c/scale + offset) = (q · c)/scale + offset·sum(q)`` — so the stored
  int8 codes are multiplied directly (cast to bf16 for the MXU) and the
  affine correction is a rank-1 update. No dequantized copy of the corpus
  ever exists.
- A ``lax.scan`` over corpus chunks keeps a running top-k, so the full
  [B, N] score matrix is never materialized in HBM.
- Multi-chip: ``shard_map`` over the mesh axis; each device scans its shard,
  then per-shard top-k candidates are ``all_gather``ed and re-merged
  (the ICI-collective equivalent of FAISS's result-heap merge).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE
from densephrases_tpu.ops.topk import topk_merge

NEG_INF = jnp.float32(-1e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf, rows, i0):
    """In-place (donated) row-range write into a device buffer."""
    return jax.lax.dynamic_update_slice(buf, rows, (i0, 0))


def _stream_to_device(codes, total_rows: int, slice_rows: int = 1 << 20):
    """Upload a host (possibly memmapped) [N, W] array into a zero-padded
    [total_rows, W] device buffer, slice by slice.

    Peak host memory is one slice (not the corpus), disk reads overlap
    the async per-slice transfers, and donation keeps peak device memory
    at ONE buffer. Tail slices are padded up to slice_rows so the write
    compiles exactly twice at most (full slice + one tail shape)."""
    n, width = codes.shape
    buf = jnp.zeros((total_rows, width), np.asarray(codes[:1]).dtype)
    for i0 in range(0, n, slice_rows):
        rows = np.ascontiguousarray(codes[i0:i0 + slice_rows])
        if rows.shape[0] < slice_rows and i0 > 0:
            pad = np.zeros((min(slice_rows, total_rows - i0) - rows.shape[0],
                            width), rows.dtype)
            rows = np.concatenate([rows, pad])
        buf = _write_rows(buf, jnp.asarray(rows), i0)
    return buf


@functools.partial(jax.jit, static_argnames=("top_k", "chunk"))
def _scan_topk_int4(queries, packed, n_valid, offset, scale,
                    *, top_k: int, chunk: int):
    """MIPS over int4-packed codes [R, D/2] (two nibbles per byte, high
    nibble = first half of the feature dim; ops/quant.float_to_int4
    layout). SQ4 parity (ref: build_phrase_index.py:103-105 QT_4bit) at
    half the HBM footprint; unpack fuses into the scan."""
    b, d = queries.shape
    qsum = queries.sum(-1) * offset
    qbf = queries.astype(jnp.bfloat16)
    col = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    n_chunks = packed.shape[0] // chunk
    k = min(top_k, chunk)
    hd = packed.shape[1]

    def body(_, i):
        c = jax.lax.dynamic_slice(packed, (i * chunk, 0), (chunk, hd))
        c = c.astype(jnp.int32)
        x = jnp.concatenate([(c // 16), (c % 16)], axis=1).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qbf, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s / scale + qsum[:, None]
        ids = i * chunk + col
        s = jnp.where(ids < n_valid, s, NEG_INF)
        vals, pos = jax.lax.approx_max_k(s, k, recall_target=0.98)
        return None, (vals, (i * chunk + pos).astype(jnp.int32))

    _, (all_vals, all_ids) = jax.lax.scan(body, None, jnp.arange(n_chunks))
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(b, n_chunks * k)
    all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(b, n_chunks * k)
    vals, pos = jax.lax.top_k(all_vals, top_k)
    ids = jnp.take_along_axis(all_ids, pos, axis=-1)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("top_k", "chunk"))
def _scan_topk(queries, codes, n_valid, offset, scale, *, top_k: int, chunk: int):
    """MIPS over one device's corpus shard: chunked matmul scan + per-chunk
    hardware-accelerated approximate top-k + one exact final merge.

    queries: [B, D] f32. codes: [R, D] int8 with R % chunk == 0 (padded) —
    chunks are sliced with dynamic_slice so the SAME flat buffer the rescore
    stage uses can be scanned (no reshaped device copy).
    n_valid: scalar — rows >= n_valid are padding and masked out.

    ``lax.approx_max_k`` uses the TPU's partial-reduce TopK unit
    (recall_target 0.98 per chunk) — an exact ``lax.top_k`` per chunk
    dominated the scan by an order of magnitude. The cross-chunk merge is
    exact.

    Returns (scores [B, K], ids [B, K] int32 local row ids).
    """
    b, d = queries.shape
    qsum = queries.sum(-1) * offset  # [B] rank-1 dequant correction
    qbf = queries.astype(jnp.bfloat16)
    col = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    n_chunks = codes.shape[0] // chunk
    k = min(top_k, chunk)

    def body(_, i):
        c_chunk = jax.lax.dynamic_slice(codes, (i * chunk, 0), (chunk, d))
        s = jax.lax.dot_general(
            qbf, c_chunk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, chunk]
        s = s / scale + qsum[:, None]
        ids = i * chunk + col  # [1, chunk]
        s = jnp.where(ids < n_valid, s, NEG_INF)
        vals, pos = jax.lax.approx_max_k(s, k, recall_target=0.98)
        return None, (vals, (i * chunk + pos).astype(jnp.int32))

    _, (all_vals, all_ids) = jax.lax.scan(body, None, jnp.arange(n_chunks))
    # [n_chunks, B, K] → exact merge
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(b, n_chunks * k)
    all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(b, n_chunks * k)
    vals, pos = jax.lax.top_k(all_vals, top_k)
    ids = jnp.take_along_axis(all_ids, pos, axis=-1)
    return vals, ids


class FlatIndex:
    """Exact MIPS index over int8 codes, optionally sharded over a mesh axis."""

    def __init__(self, codes, offset: float = DEFAULT_OFFSET,
                 scale: float = DEFAULT_SCALE, mesh: Optional[Mesh] = None,
                 shard_axis: str = "shard", chunk: int = 4096,
                 quant: str = "int8",
                 int4_offset: Optional[float] = None,
                 int4_scale: Optional[float] = None,
                 n_total: Optional[int] = None):
        """codes: [N, D] int8 — np array OR an already-device-resident jnp
        array. When a device array whose row count is chunk-aligned is
        passed (single-device case), it is used in place, so the MIPS serve
        path shares ONE HBM buffer between scan and rescore stages.

        With a mesh, codes may also be a PREASSEMBLED global jax.Array in
        the stacked [n_dev, n_chunks, chunk, D] layout sharded P(axis) —
        the multi-host path (parallel/multihost.py), where each process
        only holds its own shard and no host ever sees the full corpus.
        ``n_total`` (the real global row count) is then required.

        quant='int4' re-quantizes the vectors to 4 bits and packs two codes
        per byte on device (SQ4 parity, half the HBM footprint)."""
        assert codes.dtype == np.int8 or codes.dtype == jnp.int8
        if mesh is not None and hasattr(codes, "ndim") and codes.ndim == 4:
            assert n_total is not None, "preassembled codes need n_total"
            assert quant == "int8", "preassembled multi-host codes are int8"
            n_dev_m = mesh.shape[shard_axis]
            assert codes.shape[0] == n_dev_m and codes.shape[2] % 8 == 0
            self.quant = quant
            self.n_total, self.dim = int(n_total), int(codes.shape[3])
            self.offset, self.scale = float(offset), float(scale)
            self.mesh, self.shard_axis = mesh, shard_axis
            self.chunk = int(codes.shape[2])
            self.shard_rows = int(codes.shape[1] * codes.shape[2])
            self.codes = codes
            self._search_fn = self._build_search_fn()
            self._bench_cache = {}
            return
        self.quant = quant
        if quant == "int4":
            from densephrases_tpu.ops.quant import (
                INT4_OFFSET, INT4_SCALE, float_to_int4, int8_to_float)

            assert mesh is None, "int4 flat index is single-device for now"
            self.int4_offset = INT4_OFFSET if int4_offset is None else int4_offset
            self.int4_scale = INT4_SCALE if int4_scale is None else int4_scale
            floats = int8_to_float(np.asarray(codes), offset, scale)
            codes = float_to_int4(floats, self.int4_offset, self.int4_scale)
            # packed uint8 [N, D/2]; dim tracks the LOGICAL dim
            self._packed_width = codes.shape[1]
            self.n_total, self.dim = codes.shape[0], codes.shape[1] * 2
        else:
            self.n_total, self.dim = codes.shape
        self.offset = float(offset)
        self.scale = float(scale)
        self.mesh = mesh
        self.shard_axis = shard_axis
        n_dev = mesh.shape[shard_axis] if mesh is not None else 1
        chunk = min(chunk, max(512, _round_up(self.n_total // max(n_dev, 1) or 1, 8)))
        self.chunk = chunk

        # Pad so every device gets an equal whole number of chunks.
        self.shard_rows = _round_up(
            max(self.n_total // n_dev + (self.n_total % n_dev > 0), 1), chunk)
        total_rows = self.shard_rows * n_dev
        width = codes.shape[1]  # physical width (dim, or dim/2 packed int4)
        if (mesh is None and isinstance(codes, jnp.ndarray)
                and codes.shape[0] == total_rows):
            self.codes = codes  # shared in-place buffer
        elif mesh is None and self.n_total * width > (64 << 20):
            # Large single-device corpus: STREAM slices into a donated
            # device buffer instead of materializing a padded host copy +
            # one monolithic device_put. Avoids an O(corpus) host copy
            # (the source is typically a disk memmap) and overlaps disk
            # reads with the per-slice host→device transfers — the cold
            # serve-startup path the driver measures (mips_init_s).
            self.codes = _stream_to_device(codes, total_rows)
        else:
            padded = np.zeros((total_rows, width), np.asarray(codes).dtype)
            padded[: self.n_total] = np.asarray(codes)
            if mesh is not None:
                stacked = padded.reshape(
                    n_dev, self.shard_rows // chunk, chunk, width)
                sharding = NamedSharding(mesh, P(shard_axis))
                self.codes = jax.device_put(stacked, sharding)
            else:
                self.codes = jax.device_put(padded)
        self._search_fn = self._build_search_fn()
        self._bench_cache = {}

    def _build_search_fn(self):
        offset, scale = self.offset, self.scale
        shard_rows, chunk = self.shard_rows, self.chunk
        n_total = self.n_total

        if self.mesh is None:
            if self.quant == "int4":
                i4_off, i4_scale = self.int4_offset, self.int4_scale

                def search_fn(queries, top_k: int):
                    vals, ids = _scan_topk_int4(
                        queries, self.codes, jnp.int32(n_total),
                        i4_off, i4_scale, top_k=top_k, chunk=chunk)
                    return vals, ids  # int32: per-device rows << 2^31
                return search_fn

            def search_fn(queries, top_k: int):
                vals, ids = _scan_topk(
                    queries, self.codes, jnp.int32(n_total), offset, scale,
                    top_k=top_k, chunk=chunk)
                return vals, ids  # int32: per-device rows << 2^31
            return search_fn

        mesh, axis = self.mesh, self.shard_axis
        from densephrases_tpu.parallel import shard_map_compat

        fn_cache = {}

        def build(top_k: int):
            def sharded(queries, codes):
                shard_id = jax.lax.axis_index(axis)
                base = shard_id.astype(jnp.int64) * shard_rows
                n_valid = jnp.clip(n_total - base, 0, shard_rows).astype(jnp.int32)
                flat_codes = codes[0].reshape(shard_rows, codes.shape[-1])
                vals, ids = _scan_topk(queries, flat_codes, n_valid, offset, scale,
                                       top_k=top_k, chunk=chunk)
                gids = ids.astype(jnp.int64) + base
                # Gather every shard's candidates and merge (ICI collective).
                all_vals = jax.lax.all_gather(vals, axis)  # [S, B, K]
                all_ids = jax.lax.all_gather(gids, axis)
                m_vals, m_ids = topk_merge(
                    jnp.moveaxis(all_vals, 0, 1), jnp.moveaxis(all_ids, 0, 1), top_k)
                return m_vals, m_ids

            return jax.jit(shard_map_compat(
                sharded,
                mesh=mesh,
                in_specs=(P(), P(axis)),
                out_specs=(P(), P()),
            ))

        def search_fn(queries, top_k: int):
            if top_k not in fn_cache:
                fn_cache[top_k] = build(top_k)
            return fn_cache[top_k](queries, self.codes)

        return search_fn

    def search(self, queries, top_k: int = 10, nprobe: int = 0,
               as_numpy: bool = True):
        """queries: [B, D] float32 → (scores [B, K] f32, ids [B, K] int).
        nprobe is accepted for API uniformity with IVFIndex and ignored.
        as_numpy=False keeps results on device (no host transfer)."""
        queries = jnp.asarray(queries, jnp.float32)
        k = min(top_k, self.n_total)
        vals, ids = self._search_fn(queries, k)
        if k < top_k:  # pad to requested k for static downstream shapes
            pad = top_k - k
            vals = jnp.concatenate([vals, jnp.full((vals.shape[0], pad), NEG_INF)], -1)
            ids = jnp.concatenate([ids, jnp.zeros((ids.shape[0], pad), ids.dtype)], -1)
        if as_numpy:
            return np.asarray(vals), np.asarray(ids)
        return vals, ids

    def bench_repeat(self, queries, top_k: int = 20, reps: int = 16):
        """Dispatch-amortized scan timing: ``reps`` perturbed scans inside
        ONE jitted fori_loop, returning a scalar checksum (fetch it and
        divide the wall time by reps). See IVFIndex.bench_union_repeat for
        why: high-latency links cannot resolve sub-10-ms scans per call.
        Single-device int8 only."""
        assert self.mesh is None and self.quant == "int8"
        queries = jnp.asarray(queries, jnp.float32)
        k = min(top_k, self.n_total)
        key = (int(queries.shape[0]), k, reps)
        run = self._bench_cache.get(key)
        if run is None:
            offset, scale = self.offset, self.scale
            n_total, chunk = self.n_total, self.chunk

            def scan(q, codes):
                return _scan_topk(q, codes, jnp.int32(n_total), offset,
                                  scale, top_k=k, chunk=chunk)

            # codes passed as a jit ARGUMENT: closing over a multi-GB
            # device array captures it as an HLO constant, which remote
            # compilers reject outright
            @jax.jit
            def run(q, codes):
                def body(i, acc):
                    v, ids = scan(q + i.astype(jnp.float32) * 1e-4, codes)
                    return acc + v.sum() + ids.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            self._bench_cache[key] = run
        return run(queries, self.codes)
