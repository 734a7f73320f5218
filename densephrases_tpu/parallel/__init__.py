"""Device-mesh helpers shared by training, indexing, and serving.

All multi-chip code in the package goes through one mesh idiom: build a 1-D
``jax.sharding.Mesh`` over an axis name, annotate arrays with
``NamedSharding``, and run collectives (`all_gather`, `pmean`) inside
``shard_map``. These helpers keep mesh construction in one place so drivers
(cli/train_rc.py), indexes (index/flat.py, index/sharded.py) and the
multi-chip dryrun (__graft_entry__.py) agree on device ordering and axis
naming. Replaces the reference's torch DDP process-group setup
(ref: train_rc.py:447-455 init_process_group / DistributedDataParallel).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["Mesh", "NamedSharding", "P", "make_mesh", "shard_put",
           "replicate_put", "shard_map_compat"]


def shard_map_compat(f, mesh, in_specs, out_specs):
    """Version/platform shim over shard_map.

    The modern ``jax.shard_map`` API hits an internal lowering KeyError on
    the axon TPU platform (jax 0.9.0), so on TPU backends we keep the
    ``jax.experimental.shard_map`` entry point (it works on both cpu and
    tpu); elsewhere we use the supported ``jax.shard_map`` (with
    ``check_vma=False`` — our collectives produce per-shard results that
    are merged explicitly, same reason the legacy calls pass
    ``check_rep=False``). One call site shim so the eventual migration is
    a one-line change."""
    if jax.default_backend() != "tpu" and hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Raises if more devices are requested than exist — the caller decides the
    fallback, not the helper."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_devices is not None:
        if n_devices > len(devices):
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_put(x, mesh: Mesh, axis: Optional[str] = None):
    """Place ``x`` sharded along its leading dim over the mesh axis."""
    axis = axis if axis is not None else mesh.axis_names[0]
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate_put(x, mesh: Mesh):
    """Place ``x`` fully replicated over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))
