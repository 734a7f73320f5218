"""End-to-end serve benchmark over the REAL corpus-scale store.

The 10.5M e2e bench (tools/bench_ivf_e2e.py) serves synthetic metadata —
identity word maps and "word word ..." contexts — so its rescore+assembly
stage and mips_init never touch a realistic metadata path. This tool
serves the real D_small dump (tools/dsmall.py): real contexts, real
word↔char offset maps, compressed per-doc metadata, the trained encoder,
and the held-out dev questions as the query stream — the closest offline
analog of the reference's serve stack (meta pickle serving,
ref: /root/reference/densephrases/index.py:69-76,106-122; eval_request
protocol run_demo.py:318-356).

Reports q/s, stage decomposition (encode / search / rescore / host
assembly), metadata preload time + size, mips_init stages, and dev EM@1
as an end-to-end correctness pin.

Run: python -m densephrases_tpu.tools.bench_serve_real \
       --store cache/dsmall_r5/store_pars18780 \
       --encoder cache/dsmall_r5/encoder_qft
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
    ap.add_argument("--store", required=True)
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--qa", default=None)
    ap.add_argument("--index", default="flat",
                    help="flat, or a fine quant (SQ8/SQ4/OPQ) served from "
                         "the bench_ivf_real index cache")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs",
        "BENCH_SERVE_REAL.json"))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from densephrases_tpu.cli.common import load_encoder
    from densephrases_tpu.eval.metrics import exact_match_score
    from densephrases_tpu.index.ivf import IVFIndex
    from densephrases_tpu.index.search import MIPS
    from densephrases_tpu.index.store import PhraseStore
    from densephrases_tpu.model import DensePhrases

    store_dir = os.path.abspath(args.store)
    workdir = args.workdir or os.path.normpath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache"))
    qa_path = args.qa or os.path.join(os.path.dirname(store_dir),
                                      "qa_doc_split.json")
    dev = json.load(open(qa_path))["dev"]

    res = {"store": store_dir, "index": args.index, "batch": args.batch,
           "top_k": args.top_k, "backend": jax.default_backend()}

    # ---------------- store + metadata (the real path) ---------------
    t0 = time.perf_counter()
    store = PhraseStore.load(store_dir)
    res["store_load_s"] = round(time.perf_counter() - t0, 2)
    res["n_vecs"] = int(store.n_vecs)
    res["n_docs"] = int(store.num_docs)
    meta_file = os.path.join(store_dir, "meta.pkls")
    if os.path.exists(meta_file):
        res["meta_bytes_disk"] = os.path.getsize(meta_file)
    t0 = time.perf_counter()
    store.preload_metas(background=False)  # serve-time metadata-on-RAM
    res["meta_preload_s"] = round(time.perf_counter() - t0, 2)

    # ---------------- index ------------------------------------------
    n, d = store.n_vecs, store.dim
    t0 = time.perf_counter()
    if args.index == "flat":
        mips = MIPS(store, preload_meta=False)
        res["nprobe"] = 0
    else:
        fq = f"OPQ{d // 8}" if args.index == "OPQ" else args.index
        idx_dir = os.path.join(workdir, f"ivf_real_{fq}_{n}x{d}")
        assert os.path.exists(os.path.join(idx_dir, "save.done")), \
            f"missing {idx_dir} (run tools/bench_ivf_real.py first)"
        ivf = IVFIndex.load(idx_dir, drop_refine=args.index == "OPQ")
        mips = MIPS(store, index=ivf, preload_meta=False)
        res["nprobe"] = args.nprobe
        res["pq_decode_rescore"] = mips.pq_serve is not None
    res["mips_init_s"] = round(time.perf_counter() - t0, 2)
    res["mips_init_stages"] = mips.init_stages

    params, config, tok = load_encoder(os.path.abspath(args.encoder))
    dp = DensePhrases(params, config, tok, mips, max_query_length=24)

    # distinct real dev questions, recycled to fill the batch stream
    qs = [e["question"] for e in dev]
    golds = [[e["answer_text"]] for e in dev]
    batches = [
        (qs[i:i + args.batch], golds[i:i + args.batch])
        for i in range(0, len(qs) - args.batch + 1, args.batch)][:12]

    def one_batch(i):
        bq, _ = batches[i % len(batches)]
        qv = dp.query2vec(bq)
        return mips.search(qv, q_texts=bq, top_k=args.top_k,
                           nprobe=args.nprobe or 64, aggregate=True)

    outs = one_batch(0)
    assert len(outs) == args.batch and outs[0][0]["answer"]

    # EM@1 sanity pin over the whole dev stream (end-to-end correctness)
    t0 = time.perf_counter()
    hits = total = 0
    for bq, bg in batches:
        qv = dp.query2vec(bq)
        outs = mips.search(qv, q_texts=bq, top_k=1,
                           nprobe=args.nprobe or 64, aggregate=True)
        for ret, gold in zip(outs, bg):
            total += 1
            if ret and any(exact_match_score(ret[0]["answer"], g)
                           for g in gold):
                hits += 1
    res["dev_em1"] = round(100.0 * hits / max(total, 1), 2)
    res["dev_em1_n"] = total

    # warmup + measured windows (protocol ref: run_demo.py:331-352)
    for i in range(4):
        one_batch(i)
    n_batches = 8
    times = []
    for w in range(5):
        t0 = time.perf_counter()
        for i in range(n_batches):
            one_batch(w * n_batches + i)
        times.append(time.perf_counter() - t0)
    times.sort()
    elapsed = times[len(times) // 2]
    res["qps"] = round(n_batches * args.batch / elapsed, 1)
    res["windows_s"] = [round(t, 3) for t in times]

    # stage decomposition with REAL metadata assembly
    bq, _ = batches[0]
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: (a * 2).sum())
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(6):
        float(f(x))
    floor_ms = 1000.0 * (time.perf_counter() - t0) / 6
    np.asarray(dp.query2vec(bq))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(dp.query2vec(bq))
    encode_ms = 1000.0 * (time.perf_counter() - t0) / 4 - floor_ms
    qv = dp.query2vec(bq)
    sg, eg, ss, es = mips.search_dense(qv, top_k=args.top_k,
                                       nprobe=args.nprobe or 64)
    jax.block_until_ready(sg)
    t0 = time.perf_counter()
    for _ in range(4):
        sg, eg, ss, es = mips.search_dense(qv, top_k=args.top_k,
                                           nprobe=args.nprobe or 64)
        np.asarray(sg)
    search_ms = 1000.0 * (time.perf_counter() - t0) / 4 - floor_ms
    t0 = time.perf_counter()
    mips.search_phrase(qv, sg, eg, ss, es)
    rescore_assemble_ms = 1000.0 * (time.perf_counter() - t0)
    res["stages_ms"] = {
        "dispatch_floor": round(floor_ms, 2),
        "encode": round(encode_ms, 2),
        "search": round(search_ms, 2),
        "rescore_assemble_real_meta": round(rescore_assemble_ms, 2),
    }

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    blob = {}
    if os.path.exists(out):
        try:
            blob = json.load(open(out))
        except Exception:
            blob = {}
    blob[args.index] = res
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
