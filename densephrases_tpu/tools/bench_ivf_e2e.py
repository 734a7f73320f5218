"""End-to-end serve benchmark at IVF scale: the full pipeline over 10.5M.

The 1M headline bench (bench.py) serves a FLAT index; docs/IVF_SCALE.json
measures bare IVF scans with no encode/rescore/metadata. This tool
composes the whole serving pipeline — tokenize → BERT-base query towers
→ IVF search (OPQ96 + int8 refine by default, the reference's flagship
index config, ref: README.md:171-178, build_phrase_index.py:109-116) →
windowed span rescore → host assembly — over the 10.5M-vector corpus,
and reports q/s, stage decomposition, and stage-1 recall@20 against an
exact flat scan (protocol ref: run_demo.py:318-356 eval_request).

HBM budget note: a 10.5M OPQ96 serve fits ONE v5e chip only because the
rescore stage SHARES the index's int8 refine matrix (the original-order
corpus) instead of uploading a second 8 GB copy — see MIPS.__init__.

Inputs come from the bench_ivf_scale caches (corpus memmap + built
index dirs); the store metadata (contexts, word maps) is synthesized in
RAM around the real vectors. Ground-truth neighbors are computed with a
temporary device flat scan in a first phase and freed before the index
loads. Resumable: ground truth is cached next to the corpus.

Run on the live TPU: python tools/bench_ivf_e2e.py [--quant OPQ96]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def synth_store(corpus, vecs_per_doc: int = 1024):
    """In-RAM PhraseStore around a real [N, D] int8 memmap: N/vpd docs,
    identity word maps, synthetic contexts. Only metadata is synthetic —
    every served vector is a real corpus row."""
    from densephrases_tpu.index.store import DocMeta, PhraseStore
    from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE

    n, d = corpus.shape
    assert n % vecs_per_doc == 0
    n_docs = n // vecs_per_doc
    w2cs = np.arange(vecs_per_doc, dtype=np.int32) * 5
    w2ce = w2cs + 4
    f2o = np.arange(vecs_per_doc, dtype=np.int32)
    ctx = " ".join(["word"] * (vecs_per_doc + 2))
    meta_c = DocMeta(doc_id=0, title="doc", context=ctx,
                     word2char_start=w2cs, word2char_end=w2ce,
                     f2o_start=f2o).compress()
    metas = []
    for i in range(n_docs):
        m = dict(meta_c)
        m["doc_id"] = i
        m["title"] = f"doc{i}"
        metas.append(m)
    doc_bases = np.arange(n_docs + 1, dtype=np.int64) * vecs_per_doc
    return PhraseStore(vecs=corpus, doc_bases=doc_bases,
                       doc_ids=np.arange(n_docs, dtype=np.int64),
                       metas=metas, offset=DEFAULT_OFFSET,
                       scale=DEFAULT_SCALE, path=None)


def main():
    import logging

    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--quant", default="OPQ96",
                    help="which cached bench_ivf_scale index to serve")
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--rf", type=int, default=None,
                    help="override IVFConfig.refine_factor at search time "
                         "(rf16 buys recall@20 0.75 -> 0.96 at ~equal scan "
                         "cost per docs/IVF_SCALE.json)")
    ap.add_argument("--serve_mode", default="refine",
                    choices=("refine", "decode", "host_refine"),
                    help="refine: int8 refine matrix resident + shared "
                         "with the rescore stage (the r4 serve). decode: "
                         "NO int8 matrix anywhere on device — stage 1 is "
                         "pure PQ, stage 2 decodes candidate windows from "
                         "the residual codes (ref reconstruct() serving, "
                         "index.py:275-302) — the quantizer's true memory "
                         "point. host_refine: decode-mode device footprint "
                         "but stage-1 candidates exactly re-ranked against "
                         "the host-memmapped int8 matrix (recall of the "
                         "refine serve at ~code-bytes HBM)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--workdir", default=None,
                    help="bench_ivf_scale cache dir (default <repo>/cache)")
    ap.add_argument("--gt_only", action="store_true",
                    help="compute + cache the exact ground truth, then "
                         "exit (run as a child process so the flat-scan "
                         "HBM is released before the serve phase)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "BENCH_IVF.json"))
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu (the env var alone does not switch the
    # backend under the pinned axon plugin; see tests/conftest)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from densephrases_tpu.data.tokenization import train_wordpiece_vocab
    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.index.ivf import IVFIndex
    from densephrases_tpu.index.search import MIPS
    from densephrases_tpu.model import DensePhrases
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import init_encoder_params

    workdir = args.workdir or os.path.normpath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache"))
    corpus_path = os.path.join(workdir,
                               f"ivf_scale_corpus_{args.n}x{args.d}.npy")
    idx_dir = os.path.join(workdir,
                           f"ivf_scale_idx_{args.quant}_{args.n}x{args.d}")
    assert os.path.exists(corpus_path + ".done"), f"missing {corpus_path}"
    assert os.path.exists(os.path.join(idx_dir, "save.done")), \
        f"missing {idx_dir} (run tools/bench_ivf_scale.py first)"

    res = {"n": args.n, "d": args.d, "quant": args.quant,
           "nprobe": args.nprobe, "batch": args.batch,
           "top_k": args.top_k, "backend": jax.default_backend()}
    corpus = np.load(corpus_path, mmap_mode="r")
    store = synth_store(corpus)
    res["n_docs"] = int(store.num_docs)

    # ---------------- model + queries -------------------------------
    config = BertConfig()  # BERT-base geometry, as in bench.py
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    # Every query must tokenize DISTINCTLY: with a tiny vocab, digit
    # tokens all map to [UNK] and 64 "different" queries collapse to one
    # vector — the batch then probes ONE set of nprobe lists and the
    # union scan measures a trivially small workload (first run of this
    # bench did exactly that). Train the vocab on the words the queries
    # use, and build each query from a distinct word pair.
    words = [f"{a}{b}ton" for a in "brancespotilkugh" for b in "aeiou"]
    tok = train_wordpiece_vocab(
        ["benchmark query words " + " ".join(words) + " "],
        vocab_size=800)
    nw = len(words)
    queries = [f"benchmark query {words[i % nw]} {words[(i * 7 + 3) % nw]}"
               f" words" for i in range(args.batch)]

    # ---------------- phase A: exact ground truth (cached) ----------
    gt_path = os.path.join(workdir, f"e2e_gt_{args.n}x{args.d}.npz")
    dp = None
    if not os.path.exists(gt_path):
        if args.gt_only:
            # encode once on device (deterministic for seed-0
            # params/vocab), then exact flat top-20 for both query
            # halves. mips=None: only query2vec is used here.
            dp_tmp = DensePhrases(params, config, tok, None,
                                  max_query_length=32, serve_dtype="bf16")
            qvec = np.asarray(dp_tmp.query2vec(queries))
            stacked = np.concatenate(
                [qvec[:, :args.d], qvec[:, args.d:]], axis=0)
            # In-distribution recall probes (perturbed corpus rows — the
            # IVF_SCALE protocol): random-weight BERT queries are wildly
            # out of distribution for the Gaussian corpus (exact host
            # check: 0/20 ground-truth lists inside the top-16 probes),
            # so their recall says nothing about the index. Real serving
            # recall requires TRAINED co-embedded towers — that evidence
            # is docs/DSMALL.json; here the index is scored on vectors
            # from the corpus distribution.
            from densephrases_tpu.ops.quant import (DEFAULT_OFFSET,
                                                    DEFAULT_SCALE)
            rng = np.random.default_rng(0)
            qk = np.sort(rng.integers(0, args.n, 2 * args.batch))
            indist = (np.ascontiguousarray(corpus[qk]).astype(np.float32)
                      / DEFAULT_SCALE + DEFAULT_OFFSET)
            indist += 0.05 * rng.normal(size=indist.shape).astype(
                np.float32)
            flat = FlatIndex(corpus, chunk=65536)
            _, gt_ids = flat.search(stacked, top_k=20)
            _, gt_ind = flat.search(indist, top_k=20)
            np.savez(gt_path, qvec=qvec, gt_ids=gt_ids,
                     indist=indist, gt_ind=gt_ind)
            print("ground truth cached:", gt_path)
            return
        # fresh HBM for phase B: compute the ground truth in a CHILD
        # process — `del flat; jax.clear_caches()` does NOT reliably
        # release the 8 GB flat buffer before the ~10 GB OPQ serve
        # loads (deferred frees + executable-held constants; measured
        # RESOURCE_EXHAUSTED at MIPS init on a 16 GB chip). Process
        # exit is the only guaranteed free.
        import subprocess
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--n", str(args.n), "--d", str(args.d),
             "--quant", args.quant, "--batch", str(args.batch),
             "--workdir", workdir, "--gt_only"], check=True)
    if args.gt_only:
        print("ground truth already cached:", gt_path)
        return
    gt = np.load(gt_path)
    qvec, gt_ids = gt["qvec"], gt["gt_ids"]
    if "indist" not in gt.files:  # stale pre-indist cache: regenerate
        os.remove(gt_path)
        import subprocess
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--n", str(args.n), "--d", str(args.d),
             "--quant", args.quant, "--batch", str(args.batch),
             "--workdir", workdir, "--gt_only"], check=True)
        gt = np.load(gt_path)
        qvec, gt_ids = gt["qvec"], gt["gt_ids"]
    res["encode_dim"] = int(qvec.shape[1])
    res["distinct_qvecs"] = int(np.unique(qvec, axis=0).shape[0])
    assert res["distinct_qvecs"] == args.batch, \
        "query texts collapsed under the tiny vocab — scan workload " \
        "would be unrealistically small"

    # ---------------- phase B: serve over the IVF index -------------
    t0 = time.perf_counter()
    mode_map = {"refine": "device", "decode": "none",
                "host_refine": "host"}
    ivf = IVFIndex.load(idx_dir, refine_mode=mode_map[args.serve_mode])
    if args.rf is not None:
        ivf.cfg.refine_factor = args.rf
        res["refine_factor"] = args.rf
    res["serve_mode"] = args.serve_mode
    mips = MIPS(store, index=ivf)
    res["mips_init_s"] = round(time.perf_counter() - t0, 2)
    res["mips_init_stages"] = mips.init_stages
    res["shared_refine_rescore"] = bool(
        getattr(ivf, "refine_codes", None) is not None
        and mips.vecs_dev is ivf.refine_codes)
    res["pq_decode_rescore"] = mips.pq_serve is not None
    dp = DensePhrases(params, config, tok, mips, max_query_length=32,
                      serve_dtype="bf16")
    del params  # bf16-resident copy inside dp; drop the 1.3 GB f32 originals

    def one_batch():
        qv = dp.query2vec(queries)
        return mips.search(qv, q_texts=queries, top_k=args.top_k,
                           nprobe=args.nprobe, aggregate=True)

    outs = one_batch()
    assert len(outs) == args.batch and outs[0][0]["answer"]

    # stage-1 recall@20 vs the exact flat scan, on IN-DISTRIBUTION
    # vectors (the IVF_SCALE protocol; see the gt_only comment for why
    # random-weight BERT queries cannot measure index recall)
    _, ids = ivf.search(gt["indist"], top_k=20, nprobe=args.nprobe)
    rec = float(np.mean([
        len(set(a.tolist()) & set(g.tolist())) / 20.0
        for a, g in zip(ids, gt["gt_ind"])]))
    res["stage1_recall20_indist"] = round(rec, 4)

    # warmup + measured windows (protocol ref: run_demo.py:331-352)
    for _ in range(4):
        one_batch()
    n_batches = 8
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_batches):
            one_batch()
        times.append(time.perf_counter() - t0)
    times.sort()
    lo = times[0]
    good = [t for t in times if t <= 3.0 * lo] or times
    elapsed = good[len(good) // 2]
    res["qps"] = round(n_batches * args.batch / elapsed, 1)
    res["windows_s"] = [round(t, 3) for t in times]

    # stage decomposition (value-fetch synced)
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: (a * 2).sum())
    float(f(x))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    floor_ms = 1000.0 * ts[len(ts) // 2]
    np.asarray(dp.query2vec(queries))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(dp.query2vec(queries))
    encode_ms = 1000.0 * (time.perf_counter() - t0) / 4 - floor_ms
    qv = dp.query2vec(queries)
    sg, eg, ss, es = mips.search_dense(qv, top_k=args.top_k,
                                       nprobe=args.nprobe)
    jax.block_until_ready(sg)
    t0 = time.perf_counter()
    for _ in range(4):
        sg, eg, ss, es = mips.search_dense(qv, top_k=args.top_k,
                                           nprobe=args.nprobe)
        np.asarray(sg)
    ivf_ms = 1000.0 * (time.perf_counter() - t0) / 4 - floor_ms
    t0 = time.perf_counter()
    outs = mips.search_phrase(qv, sg, eg, ss, es)
    rescore_assemble_ms = 1000.0 * (time.perf_counter() - t0)
    res["stages_ms"] = {
        "dispatch_floor": round(floor_ms, 2),
        "encode_b64": round(encode_ms, 2),
        "ivf_search_b64": round(ivf_ms, 2),
        "rescore_assemble_b64": round(rescore_assemble_ms, 2),
    }

    # ---- device-resident bytes: every device array the serve holds
    # (the memory-point claim of the decode mode is exactly this number)
    seen = set()
    dev_bytes = 0
    cands = [ivf.codes, ivf._codes128_cache, ivf.centroids, ivf.row_perm,
             ivf.list_offsets, ivf.refine_codes, ivf.pq_books,
             ivf.rotation, mips.vecs_dev, mips.f2o_dev,
             getattr(mips, "doc_end_dev", None),
             getattr(mips, "doc_base_dev", None)]
    if mips.pq_serve:
        cands += [mips.pq_serve.get(k) for k in
                  ("codes", "books", "inv_perm", "row_list", "c_rot",
                   "rot")]
    for x in cands:
        if isinstance(x, jax.Array) and id(x) not in seen:
            seen.add(id(x))
            dev_bytes += x.nbytes
    res["device_resident_bytes"] = int(dev_bytes)
    res["device_resident_gb"] = round(dev_bytes / 2**30, 2)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    key = (f"{args.quant}"
           + (f"_rf{args.rf}" if args.rf is not None else "")
           + f"_p{args.nprobe}_{args.serve_mode}")
    blob = {}
    if os.path.exists(out):
        try:
            blob = json.load(open(out))
        except Exception:
            blob = {}
    if "rows" not in blob:
        blob = {"rows": ({"r4_legacy": blob} if blob else {})}
    blob["rows"][key] = res
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
