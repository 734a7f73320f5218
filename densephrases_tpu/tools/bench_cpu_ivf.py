"""CPU IVF-PQ baseline at the flagship operating point (10.5M OPQ96).

BASELINE.md's north-star is "≥5× FAISS-CPU queries/sec at matched
recall@20 on the full phrase index". No FAISS binary exists in this
environment, so the baseline is an in-process numpy IVF-PQ search doing
exactly the FAISS CPU algorithm (ref serve path:
/root/reference/densephrases/index.py:189-202 → faiss IndexIVFPQ ADC
scan): BLAS probe over the coarse centroids, per-query LUT
(asymmetric-distance table), LUT scan over the probed lists' codes with
the residual term, int8 refine re-rank — over the SAME saved index the
TPU rows measure, at the SAME nprobe/refine operating point, scored for
recall@20 against the SAME cached exact ground truth.

Caveats recorded in the artifact: numpy's fancy-indexed LUT scan is
within a small factor of FAISS's hand-SIMD scan per core, and this host
exposes ONE core (BLAS included) — both stated, not hidden. The matched
quantity is recall@20; q/s is the measured outcome.

Run (CPU-only, no TPU needed):
  JAX_PLATFORMS=cpu python -m densephrases_tpu.tools.bench_cpu_ivf
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def load_index_host(idx_dir):
    """Host-side view of a saved IVFIndex dir (no jax, no device)."""
    with open(os.path.join(idx_dir, "ivf.pkl"), "rb") as f:
        extra = pickle.load(f)
    d = {
        "centroids": np.load(os.path.join(idx_dir, "centroids.npy")),
        "row_perm": np.load(os.path.join(idx_dir, "row_perm.npy")),
        "list_offsets": np.load(os.path.join(idx_dir, "list_offsets.npy")),
        "codes": np.load(os.path.join(idx_dir, "codes.npy"), mmap_mode="r"),
        "rotation": extra["rotation"],
        "pq": extra["pq"],
        "offset": extra["offset"], "scale": extra["scale"],
        "pq_residual": bool(
            extra["cfg"].__dict__.get("pq_residual", False)),
    }
    rp = os.path.join(idx_dir, "refine_codes.npy")
    d["refine"] = np.load(rp, mmap_mode="r") if os.path.exists(rp) else None
    return d


def cpu_ivfpq_search(idx, queries, top_k=20, nprobe=16, refine_factor=16):
    """The FAISS-CPU IVFPQ algorithm in numpy, one query at a time (the
    per-list gather + LUT scan is inherently per-query work, exactly as
    in the C++ scan loop)."""
    cents = idx["centroids"]  # [nlist, D]
    offs = idx["list_offsets"]
    codes = idx["codes"]  # [N, M] uint8 (memmap; [N, M//2] when ksub=16)
    books = idx["pq"].codebooks  # [M, ksub, dsub]
    rot = idx["rotation"]
    m = books.shape[0]
    ksub = books.shape[1]
    packed4 = ksub == 16  # 4-bit fast-scan codes are nibble-packed
    if packed4:
        from densephrases_tpu.ops.pq import unpack_nibbles
    marange = np.arange(m)
    out_ids = np.empty((queries.shape[0], top_k), np.int64)

    # batched probe (BLAS): the C++ path does the same coarse matmul
    cs = queries @ cents.T  # [B, nlist]
    probe = np.argpartition(-cs, nprobe, axis=1)[:, :nprobe]

    q_rot = queries if rot is None else queries @ rot
    scan_k = top_k * refine_factor
    for qi in range(queries.shape[0]):
        lut = np.einsum("ms,mks->mk", q_rot[qi].reshape(m, -1), books,
                        dtype=np.float32)  # [M, 256] ADC table
        lists = probe[qi]
        parts_s, parts_r = [], []
        for li in lists:
            lo, hi = int(offs[li]), int(offs[li + 1])
            if hi <= lo:
                continue
            c = np.asarray(codes[lo:hi])  # [rows, M] (or packed [rows, M//2])
            if packed4:
                c = unpack_nibbles(c)  # [rows, M] values < 16
            s = lut[marange[None, :], c].sum(1)  # LUT scan
            if idx["pq_residual"]:
                s += float(queries[qi] @ cents[li])
            parts_s.append(s)
            parts_r.append(np.arange(lo, hi))
        s = np.concatenate(parts_s)
        rows = np.concatenate(parts_r)
        k1 = min(scan_k, s.shape[0])
        sel = np.argpartition(-s, k1 - 1)[:k1]
        gids = idx["row_perm"][rows[sel]]
        if idx["refine"] is not None:
            rrows = np.asarray(idx["refine"][gids]).astype(np.float32)
            rs = (rrows @ queries[qi] / idx["scale"]
                  + queries[qi].sum() * idx["offset"])
            best = np.argpartition(-rs, min(top_k, rs.shape[0]) - 1)
            best = best[:top_k][np.argsort(-rs[best[:top_k]])]
            out_ids[qi] = gids[best]
        else:
            best = sel[np.argsort(-s[sel])][:top_k]
            out_ids[qi] = idx["row_perm"][rows[best]]
    return out_ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--quant", default="OPQ96")
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--refine_factor", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "BENCH_IVF.json"))
    args = ap.parse_args()

    workdir = args.workdir or os.path.normpath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache"))
    idx_dir = os.path.join(workdir,
                           f"ivf_scale_idx_{args.quant}_{args.n}x{args.d}")
    cache = os.path.join(workdir, f"ivf_scale_corpus_{args.n}x{args.d}.npy")
    gt_path = cache + ".gt20.npz"
    assert os.path.exists(gt_path), "run tools/bench_ivf_scale.py first"
    from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE

    # the IVF_SCALE query protocol: perturbed corpus rows + its cached
    # exact ground truth (identical rng chain)
    host_codes = np.load(cache, mmap_mode="r")
    rng = np.random.default_rng(1)
    qids = np.sort(rng.integers(0, args.n, 65))
    qrows = np.ascontiguousarray(host_codes[qids]).astype(np.float32)
    qrows = qrows / DEFAULT_SCALE + DEFAULT_OFFSET
    qrows += 0.05 * rng.normal(size=qrows.shape).astype(np.float32)
    q64 = qrows[1:]
    gt = np.load(gt_path)
    ei64 = gt["ei64"]

    print("loading index (host)...", flush=True)
    idx = load_index_host(idx_dir)
    res = {"quant": args.quant, "n": args.n, "nprobe": args.nprobe,
           "refine_factor": args.refine_factor,
           "host_threads": os.cpu_count(),
           "blas_note": "numpy/BLAS in-process; single-core host",
           }

    # warm the page cache on the probed working set via one pass
    ids = cpu_ivfpq_search(idx, q64, top_k=20, nprobe=args.nprobe,
                           refine_factor=args.refine_factor)
    rec = float(np.mean([
        len(set(a.tolist()) & set(g.tolist())) / 20.0
        for a, g in zip(ids, ei64)]))
    res["recall20_b64"] = round(rec, 4)

    times = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        cpu_ivfpq_search(idx, q64, top_k=20, nprobe=args.nprobe,
                         refine_factor=args.refine_factor)
        times.append(time.perf_counter() - t0)
    times.sort()
    el = times[len(times) // 2]
    res["batch_s"] = round(el, 3)
    res["qps"] = round(q64.shape[0] / el, 2)
    res["windows_s"] = [round(t, 3) for t in times]
    print(json.dumps(res))

    out = os.path.abspath(args.out)
    blob = {}
    if os.path.exists(out):
        try:
            blob = json.load(open(out))
        except Exception:
            blob = {}
    if "rows" not in blob:
        blob = {"rows": ({"r4_legacy": blob} if blob else {})}
    key = (f"cpu_baseline_{args.quant}_rf{args.refine_factor}"
           f"_p{args.nprobe}")
    blob["rows"][key] = res
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)


if __name__ == "__main__":
    main()
