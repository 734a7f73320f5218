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
import numpy as np

from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
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
