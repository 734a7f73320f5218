"""IVF-vs-flat at scale: the measurement VERDICT r1 asked for.

Builds a >=10M-vector clustered corpus, an exact flat index, and a
two-level-trained IVF (nlist ~ 2^16), then measures single-query and
batch-64 latency plus recall@20 against the exact scan. Writes one JSON
blob to docs/IVF_SCALE.json and prints it.

Designed around this environment's asymmetric tunnel (H2D ~1 GB/s, D2H
~22 MB/s) and its single slow host core:

- the corpus is generated ON DEVICE in one jitted ``lax.map`` (seconds,
  vs ~90 min of host-side numpy on this VM) and used in place for the
  flat phase — zero transfers on the exact-scan path;
- it is streamed D2H once into a disk memmap cache so the IVF build
  phase (whose k-means drivers stream host blocks H2D) and any re-run
  after a crash never regenerate;
- partial results are flushed to the output JSON after every phase.

Run on the live TPU:  python tools/bench_ivf_scale.py [--n 10485760]
(never kill it mid-run — see the tunnel note in .claude/skills/verify)
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE


def gen_corpus_device(n: int, d: int, n_clusters: int = 4096, seed: int = 0,
                      block: int = 1 << 20):
    """Clustered int8 corpus generated entirely on device.

    Same distribution as the host generator this replaces: cluster
    centers ~ N(-2, 1), members = center + 0.3 * N(0, 1), quantized with
    the store's affine int8 contract. Returns a device int8 array
    [n, d]; peak device temp memory is O(block * d) f32 thanks to the
    lax.map over blocks.
    """
    import jax
    import jax.numpy as jnp

    assert n % block == 0, f"n={n} must be a multiple of block={block}"
    n_blocks = n // block
    key = jax.random.PRNGKey(seed)
    kc, kb = jax.random.split(key)

    @jax.jit
    def gen():
        centers = jax.random.normal(kc, (n_clusters, d), jnp.float32) - 2.0

        def gen_block(bk):
            ki, kn = jax.random.split(bk)
            idx = jax.random.randint(ki, (block,), 0, n_clusters)
            x = centers[idx] + 0.3 * jax.random.normal(
                kn, (block, d), jnp.float32)
            q = jnp.clip(jnp.round((x - DEFAULT_OFFSET) * DEFAULT_SCALE),
                         -128, 127)
            return q.astype(jnp.int8)

        blocks = jax.lax.map(gen_block, jax.random.split(kb, n_blocks))
        return blocks.reshape(n, d)

    return gen()


def cache_corpus(codes_dev, path: str, block: int = 1 << 20) -> None:
    """Stream a device corpus D2H into an int8 memmap at `path`.

    ~22 MB/s on this tunnel -> ~6 min for 10M x 768; done once, marked
    with a sidecar .done file so partial writes are never trusted.
    """
    n, d = codes_dev.shape
    mm = np.lib.format.open_memmap(path, mode="w+", dtype=np.int8,
                                   shape=(n, d))
    t0 = time.perf_counter()
    for b0 in range(0, n, block):
        mm[b0:b0 + block] = np.asarray(codes_dev[b0:b0 + block])
        print(f"  cached {b0 + block:,}/{n:,} rows "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    mm.flush()
    del mm
    with open(path + ".done", "w") as f:
        f.write(f"{n} {d}\n")


def timed(fn, n_rep: int = 5, warmup: int = 2):
    """Median wall time of fn() (which must block until ready)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import logging

    # force=True: jax's import already installed root handlers at WARNING,
    # which would silently swallow the build-phase INFO progress logs
    logging.basicConfig(
        level=logging.INFO, force=True,
        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--cache", default=None,
                    help="corpus memmap cache path (.npy); default "
                         "/tmp/ivf_scale_corpus_{n}x{d}.npy")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "IVF_SCALE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex

    cache = args.cache or f"/tmp/ivf_scale_corpus_{args.n}x{args.d}.npy"
    out_path = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    res = {"n": args.n, "d": args.d, "nlist": args.nlist,
           "backend": jax.default_backend()}

    def flush():
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)

    rng = np.random.default_rng(1)
    have_cache = os.path.exists(cache) and os.path.exists(cache + ".done")

    # ---------------- corpus (device-generated, memmap-cached) ----------
    t0 = time.perf_counter()
    if have_cache:
        print(f"loading cached corpus {cache} ...", flush=True)
        host_codes = np.load(cache, mmap_mode="r")
        assert host_codes.shape == (args.n, args.d)
        codes_dev = jnp.asarray(host_codes)  # H2D ~1 GB/s
    else:
        print(f"generating {args.n:,} x {args.d} corpus on device ...",
              flush=True)
        codes_dev = gen_corpus_device(args.n, args.d)
        codes_dev.block_until_ready()
        res["gen_s"] = round(time.perf_counter() - t0, 1)
        print(f"generated in {res['gen_s']}s; caching to {cache} ...",
              flush=True)
        cache_corpus(codes_dev, cache)
        host_codes = np.load(cache, mmap_mode="r")
    res["corpus_s"] = round(time.perf_counter() - t0, 1)
    flush()

    # queries: perturbed corpus rows, sampled on device (D2H is tiny)
    qids = rng.integers(0, args.n, 65)
    qrows = np.asarray(codes_dev[jnp.asarray(qids)]).astype(np.float32)
    qrows = qrows / DEFAULT_SCALE + DEFAULT_OFFSET
    qrows += 0.05 * rng.normal(size=qrows.shape).astype(np.float32)
    q1, q64 = qrows[:1], qrows[1:]

    # ---------------- flat exact scan (corpus used in place) ------------
    print("building flat index ...", flush=True)
    flat = FlatIndex(codes_dev, chunk=65536)
    ev1, ei1 = flat.search(q1, top_k=20)
    ev64, ei64 = flat.search(q64, top_k=20)
    res["flat_b1_ms"] = round(1000 * timed(
        lambda: flat.search(q1, top_k=20)), 2)
    res["flat_b64_ms"] = round(1000 * timed(
        lambda: flat.search(q64, top_k=20)), 2)
    res["flat_b64_qps"] = round(64 / (res["flat_b64_ms"] / 1000), 1)
    print(f"flat: b1 {res['flat_b1_ms']} ms, b64 {res['flat_b64_ms']} ms",
          flush=True)
    flush()
    # free the flat device buffers before the IVF goes up (HBM budget)
    del flat, codes_dev
    jax.clear_caches()

    # ---------------- IVF build (two-level quantizer) ----------------
    print(f"building IVF nlist={args.nlist} (two-level) ...", flush=True)
    t0 = time.perf_counter()
    cfg = IVFConfig(num_clusters=args.nlist, fine_quant="SQ8",
                    kmeans_iters=6, sample_ratio=min(1.0, 1e6 / args.n),
                    balance_factor=4.0)
    ivf = IVFIndex.build(host_codes, cfg, verbose=True)
    res["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    res["ivf_nlist_actual"] = int(ivf.centroids.shape[0])
    res["ivf_cap"] = int(ivf.cap)
    lens = np.diff(np.asarray(ivf.list_offsets))
    res["ivf_list_mean"] = round(float(lens.mean()), 1)
    res["ivf_list_max"] = int(lens.max())
    print(f"build {res['ivf_build_s']}s, nlist {res['ivf_nlist_actual']}, "
          f"list mean {res['ivf_list_mean']} max {res['ivf_list_max']}",
          flush=True)
    flush()

    def recall(ids, exact):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / exact.shape[1]
            for a, b in zip(ids, exact)]))

    for nprobe in (16, 64, 256):
        _, i1 = ivf.search(q1, top_k=20, nprobe=nprobe)
        _, i64 = ivf.search(q64, top_k=20, nprobe=nprobe)
        ms1 = round(1000 * timed(
            lambda: ivf.search(q1, top_k=20, nprobe=nprobe)), 2)
        ms64 = round(1000 * timed(
            lambda: ivf.search(q64, top_k=20, nprobe=nprobe)), 2)
        res[f"ivf_p{nprobe}"] = {
            "b1_ms": ms1, "b64_ms": ms64,
            "b64_qps": round(64 / (ms64 / 1000), 1),
            "recall20_b1": round(recall(i1, ei1), 4),
            "recall20_b64": round(recall(i64, ei64), 4),
        }
        print(f"nprobe={nprobe}: {res[f'ivf_p{nprobe}']}", flush=True)
        flush()

    print(json.dumps(res))


if __name__ == "__main__":
    main()
