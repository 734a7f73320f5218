"""IVF-vs-flat at scale: the measurement VERDICT r1 asked for.

Builds a >=10M-vector clustered corpus, an exact flat index, and a
two-level-trained IVF (nlist ~ 2^16), then measures single-query and
batch-64 latency plus recall@20 against the exact scan. Writes one JSON
blob to docs/IVF_SCALE.json and prints it.

Run on the live TPU:  python tools/bench_ivf_scale.py [--n 10000000]
(never kill it mid-run — see the tunnel note in .claude/skills/verify)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def make_corpus(n: int, d: int, n_clusters: int = 4096, seed: int = 0,
                block: int = 1 << 20) -> np.ndarray:
    """Clustered int8 corpus, generated block-wise (host RAM O(block))."""
    from densephrases_tpu.ops.quant import float_to_int8

    rng = np.random.default_rng(seed)
    centers = rng.normal(-2, 1.0, (n_clusters, d)).astype(np.float32)
    out = np.empty((n, d), np.int8)
    for b0 in range(0, n, block):
        m = min(block, n - b0)
        idx = rng.integers(0, n_clusters, m)
        # f32 noise straight from the generator (f64 is 2x slower + 2x RAM)
        blk = rng.standard_normal((m, d), dtype=np.float32)
        blk *= 0.3
        blk += centers[idx]
        out[b0:b0 + m] = float_to_int8(blk)
    return out


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "IVF_SCALE.json"))
    args = ap.parse_args()

    import jax

    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex

    res = {"n": args.n, "d": args.d, "nlist": args.nlist,
           "backend": jax.default_backend()}
    rng = np.random.default_rng(1)

    print(f"generating {args.n:,} x {args.d} corpus ...", flush=True)
    t0 = time.perf_counter()
    codes = make_corpus(args.n, args.d)
    res["gen_s"] = round(time.perf_counter() - t0, 1)
    q1 = codes[rng.integers(0, args.n, 1)].astype(np.float32) / 20.0 - 2.0
    q64 = codes[rng.integers(0, args.n, 64)].astype(np.float32) / 20.0 - 2.0
    q1 += 0.05 * rng.normal(size=q1.shape).astype(np.float32)
    q64 += 0.05 * rng.normal(size=q64.shape).astype(np.float32)

    # ---------------- flat exact scan ----------------
    print("building flat index ...", flush=True)
    flat = FlatIndex(codes, chunk=65536)
    ev1, ei1 = flat.search(q1, top_k=20)
    ev64, ei64 = flat.search(q64, top_k=20)
    res["flat_b1_ms"] = round(1000 * timed(
        lambda: flat.search(q1, top_k=20)), 2)
    res["flat_b64_ms"] = round(1000 * timed(
        lambda: flat.search(q64, top_k=20)), 2)
    res["flat_b64_qps"] = round(64 / (res["flat_b64_ms"] / 1000), 1)
    print(f"flat: b1 {res['flat_b1_ms']} ms, b64 {res['flat_b64_ms']} ms",
          flush=True)
    # free the flat device buffers before the IVF goes up (HBM budget)
    del flat
    jax.clear_caches()

    # ---------------- IVF build (two-level quantizer) ----------------
    print(f"building IVF nlist={args.nlist} (two-level) ...", flush=True)
    t0 = time.perf_counter()
    cfg = IVFConfig(num_clusters=args.nlist, fine_quant="SQ8",
                    kmeans_iters=6, sample_ratio=min(1.0, 1e6 / args.n),
                    balance_factor=4.0)
    ivf = IVFIndex.build(codes, cfg, verbose=True)
    res["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    res["ivf_nlist_actual"] = int(ivf.centroids.shape[0])
    res["ivf_cap"] = int(ivf.cap)
    lens = np.diff(np.asarray(ivf.list_offsets))
    res["ivf_list_mean"] = round(float(lens.mean()), 1)
    res["ivf_list_max"] = int(lens.max())
    print(f"build {res['ivf_build_s']}s, nlist {res['ivf_nlist_actual']}, "
          f"list mean {res['ivf_list_mean']} max {res['ivf_list_max']}",
          flush=True)

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

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
