"""Multi-device sharded IVF: one sub-index per device, fan-out + top-k merge.

The multi-chip story for the approximate index (the flat index's shard_map
path lives in index/flat.py): the corpus rows are partitioned across devices,
each device holds a complete IVF sub-index (its own centroids + lists + codes
in its HBM), searches run on all devices concurrently (JAX dispatch is
async), and per-shard top-k results are merged. Global ids are
``shard_base + local id`` — consistent with the flat store's contiguity
invariant, so stage-2 rescoring is unchanged.

This replaces the reference's single-machine FAISS index + GPU-cloned
quantizer (ref: index.py:52-57 quantizer-parallel only) with true
list-data-parallel search across TPU HBM.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from densephrases_tpu.index.ivf import (
    IVFConfig,
    IVFIndex,
    _probe_score,
    _union_scan,
)
from densephrases_tpu.ops.topk import topk_merge

logger = logging.getLogger(__name__)


class ShardedIVF:
    """Row-partitioned IVF over multiple devices with identical search API."""

    def __init__(self, sub_indexes: List[IVFIndex], shard_bases: List[int],
                 devices: Optional[Sequence] = None):
        assert len(sub_indexes) == len(shard_bases)
        self.subs = sub_indexes
        self.bases = shard_bases
        self.devices = list(devices) if devices is not None else None
        self.n_total = sum(s.n_total for s in sub_indexes)

    @staticmethod
    def build(codes: np.ndarray, cfg: IVFConfig,
              devices: Optional[Sequence] = None, offset: float = -2.0,
              scale: float = 20.0, verbose: bool = False) -> "ShardedIVF":
        """Partition rows evenly, build one sub-index per device, and place
        each sub-index's arrays in its device's memory."""
        devices = list(devices) if devices is not None else jax.devices()
        s = len(devices)
        n = codes.shape[0]
        per = (n + s - 1) // s
        subs, bases = [], []
        sub_clusters = max(cfg.num_clusters // s, 1)
        for i, dev in enumerate(devices):
            lo, hi = i * per, min((i + 1) * per, n)
            if lo >= hi:
                break
            sub_cfg = IVFConfig(
                num_clusters=min(sub_clusters, max((hi - lo) // 4, 1)),
                fine_quant=cfg.fine_quant, kmeans_iters=cfg.kmeans_iters,
                pq_iters=cfg.pq_iters, opq_iters=cfg.opq_iters,
                sample_ratio=cfg.sample_ratio, seed=cfg.seed + i,
                refine_factor=cfg.refine_factor,
                max_list_scan=cfg.max_list_scan,
                balance_factor=cfg.balance_factor)
            sub = IVFIndex.build(codes[lo:hi], sub_cfg, offset=offset,
                                 scale=scale, verbose=verbose)
            # pin the shard's arrays to its device
            for attr in ("centroids", "row_perm", "list_offsets", "codes",
                         "rotation", "pq_books", "refine_codes"):
                v = getattr(sub, attr)
                if v is not None:
                    setattr(sub, attr, jax.device_put(v, dev))
            subs.append(sub)
            bases.append(lo)
            logger.info("shard %d on %s: rows [%d, %d), nlist=%d",
                        i, dev, lo, hi, int(sub.centroids.shape[0]))
        return ShardedIVF(subs, bases, devices)

    def search(self, queries, top_k: int = 10, nprobe: int = 64,
               as_numpy: bool = True):
        """Fan out to every shard (async dispatch), merge top-k on host."""
        per_shard = []
        for sub in self.subs:  # dispatches overlap: jax returns futures
            vals, ids = sub.search(np.asarray(queries), top_k=top_k,
                                   nprobe=nprobe, as_numpy=False)
            per_shard.append((vals, ids))
        all_vals = np.stack([np.asarray(v) for v, _ in per_shard], axis=1)
        all_ids = np.stack(
            [np.asarray(i) + base for (_, i), base in zip(per_shard, self.bases)],
            axis=1)  # [B, S, K]
        import jax.numpy as jnp

        m_vals, m_ids = topk_merge(jnp.asarray(all_vals), jnp.asarray(all_ids),
                                   top_k)
        return np.asarray(m_vals), np.asarray(m_ids)


class MeshShardedIVF:
    """Mesh-collective sharded IVF: ONE jitted dispatch over the whole mesh.

    Each device holds one shard's sub-index (stacked arrays, sharded along
    the leading axis); a ``shard_map`` runs the local probe+scan per device,
    then an ``all_gather`` over the ICI axis merges per-shard top-k into a
    replicated global result — the same collective pattern as
    ``FlatIndex``'s sharded path (index/flat.py). This is the single-program
    multi-chip serve path; ``ShardedIVF`` above remains the host-merged
    variant for heterogeneous shards / multi-process serving.

    Shards are stacked, so shapes must match: centroids are padded to the
    max nlist (pad rows masked out of the probe via ``nlist_valid``) and
    codes to the max padded row count (pad lists are empty)."""

    def __init__(self, sub_indexes: List[IVFIndex], shard_bases: List[int],
                 mesh: Mesh, axis: str = "shard"):
        s = len(sub_indexes)
        assert s == mesh.shape[axis], (s, dict(mesh.shape))
        self.mesh = mesh
        self.axis = axis
        self.cfg = sub_indexes[0].cfg
        self.n_total = sum(sub.n_total for sub in sub_indexes)
        self.offset = sub_indexes[0].offset
        self.scale = sub_indexes[0].scale
        self.cap = max(sub.cap for sub in sub_indexes)
        assert len(set(int(b) for b in np.diff(shard_bases))) <= 1, \
            "shards must be an equal row partition (last may be short)"
        self.shard_rows = (shard_bases[1] - shard_bases[0]
                           if len(shard_bases) > 1 else sub_indexes[0].n_total)

        nlist_max = max(int(sub.centroids.shape[0]) for sub in sub_indexes)
        # Pad every shard's codes so that dynamic_slice(codes, (o, 0),
        # (cap, m)) NEVER clamps for the mesh-wide cap: each sub pads its own
        # buffer by its OWN cap, but the stacked scan slices with
        # max_s(cap_s). A shard whose cap is smaller than the mesh cap would
        # otherwise have its tail lists' slices clamped backwards onto the
        # wrong lists (silently wrong ids). Required: rows >= n_s + cap for
        # every shard; also >= every existing buffer so np.stack can work.
        rows_need = max(int(np.asarray(sub.list_offsets)[-1])
                        for sub in sub_indexes) + self.cap
        rows_max = max(rows_need,
                       max(int(sub.codes.shape[0]) for sub in sub_indexes))
        is_pq = sub_indexes[0].pq is not None
        has_rot = sub_indexes[0].rotation is not None
        has_refine = sub_indexes[0].refine_codes is not None
        # SQ4 shards store packed nibbles: the scan must unpack them and
        # score with the INT4 affine, so the flag + affine must agree
        # across shards (SQ8 vs SQ4 both have pq=None — the pq check alone
        # would let a mixed stack through and score nibbles as int8)
        self.sq4 = bool(sub_indexes[0].sq4)
        self.int4_offset = sub_indexes[0].int4_offset
        self.int4_scale = sub_indexes[0].int4_scale
        # residual-encoded PQ (shards built under one cfg agree; the scan
        # must add q·centroid back per probed list)
        self.pq_residual = bool(getattr(sub_indexes[0], "pq_residual",
                                        False))
        for sub in sub_indexes:
            assert (sub.pq is not None) == is_pq, "mixed fine_quant shards"
            assert (sub.rotation is not None) == has_rot
            assert (sub.refine_codes is not None) == has_refine
            assert bool(getattr(sub, "pq_residual", False)) \
                == self.pq_residual, "mixed residual/full-vector PQ shards"
            assert bool(sub.sq4) == self.sq4, "mixed SQ4/SQ8 shards"
            if self.sq4:
                assert (np.array_equal(sub.int4_offset, self.int4_offset)
                        and np.array_equal(sub.int4_scale,
                                           self.int4_scale)), \
                    "shards disagree on the int4 affine"

        def stack(get, pad_rows=None, pad_val=0):
            outs = []
            for sub in sub_indexes:
                a = np.asarray(get(sub))
                if pad_rows is not None and a.shape[0] < pad_rows:
                    pad = np.full((pad_rows - a.shape[0],) + a.shape[1:],
                                  pad_val, a.dtype)
                    a = np.concatenate([a, pad])
                outs.append(a)
            return np.stack(outs)

        shard_spec = NamedSharding(mesh, P(axis))
        # pad centroids by repeating row 0 (masked out via nlist_valid);
        # pad list_offsets by repeating the total (pad lists are empty)
        self.centroids = jax.device_put(
            stack(lambda s_: np.asarray(s_.centroids),
                  pad_rows=nlist_max), shard_spec)
        self.list_offsets = jax.device_put(stack(
            lambda s_: np.concatenate([
                np.asarray(s_.list_offsets),
                np.full(nlist_max - (len(s_.list_offsets) - 1),
                        np.asarray(s_.list_offsets)[-1], np.int32)])),
            shard_spec)
        self.codes = jax.device_put(
            stack(lambda s_: s_.codes, pad_rows=rows_max), shard_spec)
        self.row_perm = jax.device_put(
            stack(lambda s_: s_.row_perm, pad_rows=rows_max), shard_spec)
        self.nlist_valid = jax.device_put(
            np.array([[int(s_.centroids.shape[0])] for s_ in sub_indexes],
                     np.int32), shard_spec)
        self.rotation = (jax.device_put(stack(lambda s_: s_.rotation),
                                        shard_spec) if has_rot else None)
        self.pq_books = (jax.device_put(stack(lambda s_: s_.pq_books),
                                        shard_spec) if is_pq else None)
        if has_refine:
            refine_rows = max(int(s_.refine_codes.shape[0])
                              for s_ in sub_indexes)
            self.refine_codes = jax.device_put(
                stack(lambda s_: s_.refine_codes, pad_rows=refine_rows),
                shard_spec)
        else:
            self.refine_codes = None
        self._fn_cache = {}

    @staticmethod
    def build(codes: np.ndarray, cfg: IVFConfig, mesh: Mesh,
              axis: str = "shard", offset: float = -2.0, scale: float = 20.0,
              verbose: bool = False) -> "MeshShardedIVF":
        s = int(mesh.shape[axis])
        n = codes.shape[0]
        per = (n + s - 1) // s
        subs, bases = [], []
        ranges = MeshShardedIVF._shared_int4_ranges(codes, cfg, offset, scale)
        for i in range(s):
            lo, hi = i * per, min((i + 1) * per, n)
            assert lo < hi, f"more shards ({s}) than rows ({n})"
            sub_cfg = IVFConfig(
                num_clusters=max(cfg.num_clusters // s, 1),
                fine_quant=cfg.fine_quant, kmeans_iters=cfg.kmeans_iters,
                pq_iters=cfg.pq_iters, opq_iters=cfg.opq_iters,
                sample_ratio=cfg.sample_ratio, seed=cfg.seed + i,
                refine_factor=cfg.refine_factor,
                max_list_scan=cfg.max_list_scan,
                balance_factor=cfg.balance_factor,
                two_level_clusters=cfg.two_level_clusters,
                assign_probe=cfg.assign_probe,
                prefer_union_batch=cfg.prefer_union_batch,
                int4_ranges=ranges, sq4_train_ranges=cfg.sq4_train_ranges)
            subs.append(IVFIndex.build(codes[lo:hi], sub_cfg, offset=offset,
                                       scale=scale, verbose=verbose))
            bases.append(lo)
        return MeshShardedIVF(subs, bases, mesh, axis=axis)

    @staticmethod
    def _shared_int4_ranges(codes, cfg, offset, scale):
        """Sharded SQ4 builds must share ONE trained int4 contract (the
        collective merge compares scores across shards); train it once on
        a global subsample instead of per shard."""
        if cfg.fine_quant != "SQ4":
            return getattr(cfg, "int4_ranges", None)
        if getattr(cfg, "int4_ranges", None) is not None:
            return cfg.int4_ranges
        if not getattr(cfg, "sq4_train_ranges", True):
            return None
        from densephrases_tpu.ops.quant import train_int4_ranges

        sub = np.ascontiguousarray(
            codes[:: max(len(codes) // 131072, 1)])
        sub_f = (sub.astype(np.float32) / scale + offset
                 if sub.dtype == np.int8 else sub.astype(np.float32))
        return train_int4_ranges(sub_f)

    def _build_fn(self, top_k: int, nprobe: int, batch: int):
        from densephrases_tpu.parallel import shard_map_compat

        axis = self.axis
        # SQ4 codes are packed nibbles: score with the int4 affine
        # (IVFIndex.search_union does the same, ivf.py)
        sq4 = self.sq4
        i4_vec = sq4 and getattr(self, "int4_vector",
                                 np.ndim(self.int4_offset) > 0)
        if i4_vec:
            # trained per-dim contract: fold the scale vector into the
            # query and the bias into a vector offset (see
            # IVFIndex._scan_contract); scan scale stays 1.0
            i4_scale_v = jnp.asarray(self.int4_scale, jnp.float32)
            offset = i4_scale_v * jnp.asarray(self.int4_offset, jnp.float32)
            scale = jnp.float32(1.0)
        else:
            offset, scale = ((self.int4_offset, self.int4_scale) if sq4
                             else (self.offset, self.scale))
        cap, cfg = self.cap, self.cfg
        shard_rows = self.shard_rows
        is_pq = self.pq_books is not None
        pq_res = is_pq and self.pq_residual
        do_refine = is_pq and self.refine_codes is not None
        scan_k = (min(top_k * cfg.refine_factor, max(self.n_total, 1))
                  if do_refine else min(top_k, max(self.n_total, 1)))
        # the per-probe scan never learned to unpack nibbles (by design,
        # see IVFIndex.search): SQ4 always routes through the union scan
        use_union = sq4 or batch >= cfg.prefer_union_batch
        mdim = int(self.codes.shape[-1])
        row_budget = (32 * 1024 * 1024 // (mdim * 256 * 2) if is_pq
                      else 8 * 1024 * 1024 // max(mdim, 1))
        group = int(np.clip(row_budget // max(cap, 1), 1, 64))

        def sharded(queries, centroids, list_offsets, codes, row_perm,
                    nlist_valid, rotation, pq_books, refine_codes):
            centroids, list_offsets = centroids[0], list_offsets[0]
            codes, row_perm = codes[0], row_perm[0]
            nv = nlist_valid[0, 0]
            rot = None if rotation is None else rotation[0]
            books = None if pq_books is None else pq_books[0]
            refine = None if refine_codes is None else refine_codes[0]
            if i4_vec:
                q_rot = queries / i4_scale_v
            else:
                q_rot = queries if rot is None else queries @ rot
            common = (queries, q_rot, centroids, list_offsets, codes,
                      row_perm, books, refine, jnp.asarray(offset),
                      jnp.asarray(scale), nv)
            if use_union:
                vals, ids = _union_scan(*common, top_k=top_k, nprobe=nprobe,
                                        cap=cap, group=group, scan_k=scan_k,
                                        sq4=sq4, pq_residual=pq_res)
            else:
                vals, ids = _probe_score(*common, top_k=top_k, nprobe=nprobe,
                                         cap=cap, scan_k=scan_k,
                                         pq_residual=pq_res)
            # int32 gids: without x64, int64 silently truncates anyway; the
            # tiered/store layer re-widens on host for >2^31-row corpora
            base = jax.lax.axis_index(axis).astype(jnp.int32) * shard_rows
            gids = ids.astype(jnp.int32) + base
            all_vals = jax.lax.all_gather(vals, axis)  # [S, B, K]
            all_ids = jax.lax.all_gather(gids, axis)
            return topk_merge(jnp.moveaxis(all_vals, 0, 1),
                              jnp.moveaxis(all_ids, 0, 1), top_k)

        # None args carry no leaves, so P(axis) on them is a no-op
        return jax.jit(shard_map_compat(
            sharded, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
        ))

    def search(self, queries, top_k: int = 10, nprobe: int = 64,
               as_numpy: bool = True):
        """One collective dispatch over the mesh. Same API as IVFIndex."""
        queries = jnp.asarray(queries, jnp.float32)
        nprobe = min(nprobe,
                     int(np.asarray(self.nlist_valid).ravel().min()))
        k = min(top_k, self.n_total)
        key = (k, nprobe, queries.shape[0] >= self.cfg.prefer_union_batch)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_fn(k, nprobe, queries.shape[0])
        vals, ids = self._fn_cache[key](
            queries, self.centroids, self.list_offsets, self.codes,
            self.row_perm, self.nlist_valid, self.rotation, self.pq_books,
            self.refine_codes)
        if k < top_k:
            pad = top_k - k
            vals = jnp.concatenate(
                [vals, jnp.full((vals.shape[0], pad), -1e30)], 1)
            ids = jnp.concatenate(
                [ids, jnp.zeros((ids.shape[0], pad), ids.dtype)], 1)
        if as_numpy:
            return np.asarray(vals), np.asarray(ids)
        return vals, ids
