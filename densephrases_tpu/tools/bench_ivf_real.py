"""IVF quantizer grid over REAL phrase vectors (the D_small dump).

Every at-scale IVF recall number before round 5 rode on a synthetic
clustered-Gaussian corpus (tools/bench_ivf_scale.py). Real phrase vectors
are anisotropic, topic-clustered, and filter-pruned — they stress
k-means, OPQ, and nprobe differently. This tool rebuilds the quantizer
grid (SQ8 / SQ4 / OPQ-residual) over the real corpus-scale D_small dump
(tools/dsmall.py, store_pars18780: 1.2M x 320 real encoder outputs) and
measures recall@20 against the exact int8 flat scan with REAL queries:
the held-out dev questions encoded by the trained query towers — the
actual serve-time query distribution, not perturbed corpus rows.

The OPQ point uses M = D/8 subspaces (8 dims per subspace — the same
subspace geometry as the reference's flagship OPQ96 at 768-d,
ref: build_phrase_index.py:109-116).

Writes a ``real_vectors`` section into docs/IVF_SCALE.json.

Run: python -m densephrases_tpu.tools.bench_ivf_real \
       --store cache/dsmall_r5/store_pars18780 --encoder cache/dsmall_r5/encoder
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True,
                    help="real phrase store dir (tools/dsmall.py output)")
    ap.add_argument("--encoder", required=True,
                    help="trained encoder dir (query towers for real "
                         "query vectors)")
    ap.add_argument("--qa", default=None,
                    help="dsmall qa_doc_split.json (dev questions); "
                         "default <store>/../qa_doc_split.json")
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nq", type=int, default=256,
                    help="dev questions to encode as recall probes")
    ap.add_argument("--quants", default="SQ8,SQ4,OPQ")
    ap.add_argument("--probes", default="16,64")
    ap.add_argument("--refine_factor", type=int, default=16)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "IVF_SCALE.json"))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from densephrases_tpu.cli.common import load_encoder
    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.index.store import PhraseStore
    from densephrases_tpu.model import DensePhrases

    store = PhraseStore.load(os.path.abspath(args.store))
    vecs = np.asarray(store.vecs)
    n, d = vecs.shape
    workdir = args.workdir or os.path.normpath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache"))

    qa_path = args.qa or os.path.join(
        os.path.dirname(os.path.abspath(args.store)), "qa_doc_split.json")
    dev_qs = [e["question"]
              for e in json.load(open(qa_path))["dev"]][: args.nq]

    params, config, tok = load_encoder(os.path.abspath(args.encoder))
    dp = DensePhrases(params, config, tok, None, max_query_length=24)
    t0 = time.perf_counter()
    qvec = np.asarray(dp.query2vec(dev_qs))  # [nq, 2D]
    encode_s = round(time.perf_counter() - t0, 1)
    # stage-1 operates on stacked start/end halves — recall is measured
    # on exactly the rows the serve path sends to the index
    stacked = np.concatenate([qvec[:, :d], qvec[:, d:]], axis=0)

    flat = FlatIndex(vecs, store.offset, store.scale, chunk=65536)
    _, gt_ids = flat.search(stacked, top_k=20)
    del flat
    jax.clear_caches()

    def recall(ids):
        return float(np.mean([
            len(set(a.tolist()) & set(g.tolist())) / 20.0
            for a, g in zip(ids, gt_ids)]))

    section = {
        "store": os.path.abspath(args.store), "n": int(n), "d": int(d),
        "nlist": args.nlist, "n_queries": len(dev_qs),
        "query_source": "document-held-out dev questions, trained towers",
        "encode_s": encode_s,
    }
    probes = [int(p) for p in args.probes.split(",")]
    m_opq = d // 8  # flagship subspace geometry: 8 dims per subspace
    for quant in args.quants.split(","):
        fq = f"OPQ{m_opq}" if quant == "OPQ" else quant
        idx_dir = os.path.join(workdir, f"ivf_real_{fq}_{n}x{d}")
        t0 = time.perf_counter()
        if os.path.exists(os.path.join(idx_dir, "save.done")):
            ivf = IVFIndex.load(idx_dir)
            build_s = None
        else:
            cfg = IVFConfig(num_clusters=args.nlist, fine_quant=fq,
                            kmeans_iters=6, balance_factor=4.0,
                            refine_factor=args.refine_factor)
            ivf = IVFIndex.build(vecs, cfg, verbose=True)
            build_s = round(time.perf_counter() - t0, 1)
            ivf.save(idx_dir)
            with open(os.path.join(idx_dir, "save.done"), "w") as f:
                f.write("ok\n")
        row = {
            "build_s": build_s,
            "nlist_actual": int(ivf.centroids.shape[0]),
            "list_mean": round(float(np.diff(
                np.asarray(ivf.list_offsets)).mean()), 1),
            "list_max": int(np.diff(np.asarray(ivf.list_offsets)).max()),
            "code_bytes": int(np.asarray(ivf.codes[:1]).dtype.itemsize
                              * ivf.n_real * ivf.codes.shape[1]),
        }
        for p in probes:
            t0 = time.perf_counter()
            _, ids = ivf.search(stacked, top_k=20, nprobe=p)
            row[f"p{p}"] = {
                "recall20": round(recall(ids), 4),
                "search_s": round(time.perf_counter() - t0, 2),
            }
            if quant == "OPQ" and ivf.refine_codes is not None:
                # the decode-serve memory point: recall WITHOUT the int8
                # refine matrix (stage-1 PQ ranking only)
                rc = ivf.refine_codes
                ivf.refine_codes = None
                _, ids_nr = ivf.search(stacked, top_k=20, nprobe=p)
                row[f"p{p}"]["recall20_norefine"] = round(recall(ids_nr), 4)
                ivf.refine_codes = rc
        section[f"ivf_{fq}"] = row
        print(f"{fq}: {row}", flush=True)
        del ivf
        jax.clear_caches()

    out = os.path.abspath(args.out)
    res = json.load(open(out)) if os.path.exists(out) else {}
    res["real_vectors"] = section
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(section))


if __name__ == "__main__":
    main()
