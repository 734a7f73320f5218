"""Multi-host (DCN) index sharding.

The reference is a single-machine system — one process mmap-loads one
FAISS index (ref: densephrases/index.py:60-101). At reference corpus
scale (60GB+ of phrase vectors, README.md:171-178) a single TPU host's
HBM cannot hold the store, so the TPU-native design shards the phrase
store across HOSTS:

- every host memmaps ONLY its own store shard from local disk (the
  dump stage already writes per-range shards, tools/parallel_dump.py);
- each host uploads its rows to its local chips, and the shards are
  assembled into ONE global jax.Array (`jax.make_array_from_single_
  device_arrays`) laid out exactly like FlatIndex's single-host stacked
  mesh layout;
- search is one SPMD program over the global mesh: per-chip exact
  scans + all_gather/top-k merge. XLA routes the collectives over ICI
  within a slice and DCN across slices — no NCCL/MPI analog needed;
- queries are broadcast host-0 → all (process_allgather over DCN), so
  one serving frontend drives the whole fleet.

The same program and layout serve single-host multi-chip (FlatIndex's
own mesh path) and multi-host; this module only adds the process
bootstrap and the shard assembly. Simulated multi-process CPU coverage:
tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int) -> None:
    """Join the JAX distributed runtime (TPU pods: one call per host
    before any jax use; the TPU runtime usually autodetects these args).
    Replaces the reference's torch init_process_group
    (ref: train_rc.py:447-455) — but for SPMD arrays, not DDP."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over ALL devices of every process (process-major order)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def shard_layout(n_total: int, mesh: Mesh, axis: str = "shard",
                 chunk: int = 4096) -> Tuple[int, int]:
    """(shard_rows, chunk) of the stacked layout — the same arithmetic as
    FlatIndex so row ids agree between the two construction paths."""
    n_dev = mesh.shape[axis]
    chunk = min(chunk, max(512, _round_up(n_total // max(n_dev, 1) or 1, 8)))
    shard_rows = _round_up(
        max(n_total // n_dev + (n_total % n_dev > 0), 1), chunk)
    return shard_rows, chunk


def process_row_range(n_total: int, mesh: Mesh, axis: str = "shard",
                      chunk: int = 4096) -> Tuple[int, int]:
    """Global [lo, hi) row range THIS process must load from its store
    shard (clipped to n_total; the assembly pads the tail)."""
    shard_rows, _ = shard_layout(n_total, mesh, axis, chunk)
    devs = list(mesh.devices.reshape(-1))
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    assert mine, "this process owns no devices in the mesh"
    assert mine == list(range(mine[0], mine[0] + len(mine))), (
        "process devices must be contiguous in mesh order (1-D mesh over "
        "jax.devices() is process-major — use global_mesh())")
    lo = mine[0] * shard_rows
    hi = (mine[-1] + 1) * shard_rows
    return min(lo, n_total), min(hi, n_total)


def flat_from_process_shards(local_rows: np.ndarray, n_total: int,
                             mesh: Optional[Mesh] = None,
                             axis: str = "shard", chunk: int = 4096,
                             offset: Optional[float] = None,
                             scale: Optional[float] = None):
    """Assemble a multi-host FlatIndex from per-process store shards.

    local_rows: int8 [hi - lo, D] — exactly the rows process_row_range
    reported for this process, in global row order. Every process must
    call this collectively with the same n_total/mesh/chunk. Returns a
    FlatIndex whose search ids are GLOBAL row ids.
    """
    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE

    mesh = mesh if mesh is not None else global_mesh(axis)
    shard_rows, chunk = shard_layout(n_total, mesh, axis, chunk)
    d = int(local_rows.shape[1])
    devs = list(mesh.devices.reshape(-1))
    mine = [i for i, dev in enumerate(devs)
            if dev.process_index == jax.process_index()]
    lo = mine[0] * shard_rows

    arrs = []
    for j, gi in enumerate(mine):
        block = np.zeros((1, shard_rows // chunk, chunk, d), np.int8)
        s = gi * shard_rows - lo
        e = min(s + shard_rows, local_rows.shape[0])
        if e > s:
            rows = np.asarray(local_rows[s:e])
            block.reshape(shard_rows, d)[: e - s] = rows
        arrs.append(jax.device_put(block, devs[gi]))

    g = jax.make_array_from_single_device_arrays(
        (len(devs), shard_rows // chunk, chunk, d),
        NamedSharding(mesh, P(axis)), arrs)
    return FlatIndex(
        g, offset=DEFAULT_OFFSET if offset is None else offset,
        scale=DEFAULT_SCALE if scale is None else scale, mesh=mesh,
        shard_axis=axis, chunk=chunk, n_total=n_total)


def broadcast_queries(queries: np.ndarray) -> np.ndarray:
    """Host-0 → all-hosts query broadcast (SPMD programs require every
    process to feed identical replicated inputs). No-op single-process."""
    if jax.process_count() == 1:
        return np.asarray(queries)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(queries))
