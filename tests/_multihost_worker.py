"""Worker for tests/test_multihost.py — one simulated 'host'.

Each process forces 2 CPU devices, joins the distributed runtime (Gloo
collectives = the DCN stand-in), loads ONLY its own global row range,
assembles the global sharded index, searches, verifies scores exactly
against a local brute-force scan, and writes its ids for the parent's
cross-process agreement check. Run: _multihost_worker.py PORT PID NPROC OUT
"""

import os
import sys


def main():
    port, pid, nproc, out_dir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    # override (not extend): the parent test runner may itself force a
    # different host device count
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # initialize the distributed runtime BEFORE anything can touch the
    # XLA backend (package imports build jitted callables)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from densephrases_tpu.parallel.multihost import (
        broadcast_queries,
        flat_from_process_shards,
        global_mesh,
        process_row_range,
    )
    from densephrases_tpu.ops.quant import (
        DEFAULT_OFFSET,
        DEFAULT_SCALE,
        float_to_int8,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    # big enough that every one of the 4 global devices holds REAL rows
    # under the chunk-padded layout (empty tail shards are legal but make
    # a weaker test)
    n, d = 3000, 64
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, d)).astype(np.float32) * 0.4
    codes = float_to_int8(corpus)

    mesh = global_mesh()
    lo, hi = process_row_range(n, mesh)
    assert 0 <= lo < hi <= n, (lo, hi)
    # THIS process only ever touches its own shard rows
    idx = flat_from_process_shards(codes[lo:hi], n, mesh)

    queries = broadcast_queries(
        np.random.default_rng(7).normal(size=(8, d)).astype(np.float32))
    vals, ids = idx.search(queries, top_k=10)

    # exact per-id score check vs the kernel's own arithmetic (bf16
    # operands, f32 accumulation, affine int8 correction)
    import jax.numpy as jnp

    raw = np.asarray(jax.jit(lambda q, c: jax.lax.dot_general(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))(queries, codes))
    brute = raw / DEFAULT_SCALE + (
        queries.sum(-1, keepdims=True) * DEFAULT_OFFSET)
    got = np.take_along_axis(brute, np.asarray(ids, np.int64), axis=1)
    np.testing.assert_allclose(np.asarray(vals), got, atol=1e-4, rtol=0)

    # per-chunk approx_max_k is allowed to drop a tail entry; demand
    # near-perfect agreement with the true top-10
    want = np.argsort(-brute, axis=1)[:, :10]
    recall = np.mean([len(set(a) & set(b)) / 10
                      for a, b in zip(np.asarray(ids), want)])
    assert recall >= 0.9, recall

    np.save(os.path.join(out_dir, f"ids_{pid}.npy"), np.asarray(ids))
    with open(os.path.join(out_dir, f"ok_{pid}"), "w") as f:
        f.write(f"recall={recall}\n")


if __name__ == "__main__":
    main()
