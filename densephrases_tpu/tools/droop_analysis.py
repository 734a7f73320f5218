"""Explain the packed-scan "batch recall droop" (VERDICT r4 weak #6).

The grid artifact (docs/IVF_SCALE.json) prints recall20_b1 = 1.0 but
recall20_b64 = 0.98 for SQ8 p16 — which LOOKS like the batched union
scan loses recall. But the two rows are computed over DISJOINT query
sets: b1 scores only query 0 of the 65-query draw, b64 the other 64.
A single easy query vs a 64-query mean is not a batch effect.

This tool runs the controlled experiment the artifact lacks: the SAME
64 queries, searched one-at-a-time (true b1) and in one batch (b64),
per-query recall@20 against the cached exact ground truth, at p16/p64,
over the cached 10.5M indexes. Three mechanisms are distinguishable:

- sampling:   per-query b1 == per-query b64 everywhere; the artifact's
              b1/b64 gap is the lone-query draw, not batching.
- truncation: b64 < b1 for some queries — the packed scan's SMEM-
              clamped guard tier (ivf.py _pack_budgets) cut list
              coverage at the batch's union block total. The tool
              reports the actual union block total vs the tier budgets
              so this is checkable directly.
- routing:    b1 != b64 through DIFFERENT formulations (batch < 4
              routes to the per-probe scan for non-PQ quants —
              ivf.py search(); PQ always takes the union scan), so a
              gap can also mean the two code paths disagree. The tool
              pins the union scan for both sides (search_union) and
              ALSO reports the default-routing b1 for completeness.

Writes a ``droop_analysis`` section into docs/IVF_SCALE.json.

Run: python -m densephrases_tpu.tools.droop_analysis --quants SQ8,OPQ96
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE  # noqa: E402


def main():
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--quants", default="SQ8,OPQ96")
    ap.add_argument("--probes", default="16,64")
    ap.add_argument("--refine_factor", type=int, default=16,
                    help="search-time refine window for PQ quants")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "IVF_SCALE.json"))
    args = ap.parse_args()

    from densephrases_tpu.index.ivf import IVFIndex

    workdir = args.workdir or os.path.normpath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache"))

    # the grid's exact query draw (bench_ivf_scale.py): 65 perturbed
    # corpus rows; row 0 is the artifact's "b1" query, rows 1..64 its b64
    cache = os.path.join(workdir, f"ivf_scale_corpus_{args.n}x{args.d}.npy")
    host_codes = np.load(cache, mmap_mode="r")
    rng = np.random.default_rng(1)
    qids = np.sort(rng.integers(0, args.n, 65))
    qrows = np.ascontiguousarray(host_codes[qids]).astype(np.float32)
    qrows = qrows / DEFAULT_SCALE + DEFAULT_OFFSET
    qrows += 0.05 * rng.normal(size=qrows.shape).astype(np.float32)
    q64 = qrows[1:]

    gt = np.load(cache + ".gt20.npz")
    ei64 = gt["ei64"]          # [64, 20] exact ids for the b64 queries

    def per_query_recall(ids):
        return np.array([
            len(set(a.tolist()) & set(g.tolist())) / ei64.shape[1]
            for a, g in zip(ids, ei64)])

    out = {}
    for quant in (q.strip() for q in args.quants.split(",")):
        idx_dir = os.path.join(
            workdir, f"ivf_scale_idx_{quant}_{args.n}x{args.d}")
        if not os.path.exists(os.path.join(idx_dir, "save.done")):
            print(f"[{quant}] no cached index at {idx_dir}; skipping",
                  flush=True)
            continue
        ivf = IVFIndex.load(idx_dir)
        if ivf.pq_books is not None:
            ivf.cfg.refine_factor = args.refine_factor
        qrow = {"refine_factor": (args.refine_factor
                                  if ivf.pq_books is not None else None)}
        lens = np.diff(np.asarray(ivf.list_offsets))
        # packed block geometry (ops/ivf_pack RB=32 rows per DMA block,
        # +alignment): reuse the exact budget-table block counts
        offs = np.asarray(ivf.list_offsets, np.int64)
        blens = np.minimum(np.diff(offs), ivf.cap)
        blocks_per_list = ((offs[:-1] + blens + 31) // 32
                           - offs[:-1] // 32).astype(np.int64)
        order = np.argsort(-blocks_per_list)
        for p in (int(x) for x in args.probes.split(",")):
            # per-batch union block totals vs the compiled budget tiers:
            # is the SMEM-clamped guard tier ever the binding constraint?
            cents = np.asarray(ivf.centroids, np.float32)
            cs = q64 @ cents.T
            probed = np.argpartition(-cs, p - 1, axis=1)[:, :p]
            union = np.unique(probed.ravel())
            union_blocks = int(blocks_per_list[union].sum())
            budgets = ivf._pack_budgets(64, p)
            worst_theoretical = int(
                blocks_per_list[order[:min(64 * p, len(lens))]].sum())

            # the controlled comparison, SAME 64 queries both sides,
            # forced through the union scan
            _, i_b64 = ivf.search_union(q64, top_k=20, nprobe=p)
            i_b1 = np.concatenate([
                ivf.search_union(q64[i:i + 1], top_k=20, nprobe=p)[1]
                for i in range(64)])
            r64 = per_query_recall(i_b64)
            r1 = per_query_recall(i_b1)
            # and the default routing for b1 (per-probe scan for SQ8)
            _, i_b1_def = ivf.search(q64[:1], top_k=20, nprobe=p)
            r1_def = per_query_recall(i_b1_def[:1])[0]

            qrow[f"p{p}"] = {
                "recall20_b64_mean": round(float(r64.mean()), 4),
                "recall20_b1_mean": round(float(r1.mean()), 4),
                "n_queries_b64_lt_b1": int((r64 < r1).sum()),
                "n_queries_b64_gt_b1": int((r64 > r1).sum()),
                "max_abs_per_query_gap": round(
                    float(np.abs(r64 - r1).max()), 4),
                "default_route_b1_query1_recall": round(float(r1_def), 4),
                "union_blocks_b64": union_blocks,
                "budget_tiers": list(budgets),
                "worst_case_blocks": worst_theoretical,
                "truncated": union_blocks > max(budgets),
            }
            print(f"[{quant}] p{p}: {qrow[f'p{p}']}", flush=True)
        out[quant] = qrow
        del ivf
        import jax
        jax.clear_caches()

    path = os.path.abspath(args.out)
    blob = json.load(open(path)) if os.path.exists(path) else {}
    sec = blob.get("droop_analysis", {})
    sec["protocol"] = ("same 64 queries, union scan pinned, b1 vs b64 "
                       "per-query recall@20 vs exact GT; grid rows' "
                       "recall20_b1 is a SINGLE different query")
    sec.update(out)  # merge per-quant (separate runs per cached index)
    blob["droop_analysis"] = sec
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob["droop_analysis"], indent=1))


if __name__ == "__main__":
    main()
