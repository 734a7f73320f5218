"""End-to-end benchmark: queries/sec through the full search pipeline.

Mirrors the reference's serving benchmark protocol: batched queries, 5-batch
warmup excluded, Q/sec reported (ref: run_demo.py:318-356 eval_request).
The pipeline measured is query encoding (BERT-base query towers) + flat MIPS
over a synthetic phrase corpus + two-stage span rescore — the full hot path.

The baseline is MEASURED in-process: a multi-threaded CPU SQ8 scan (chunked
dequantize + BLAS sgemm + top-k) over the exact same corpus and batch size —
what a FAISS-CPU IndexScalarQuantizer effectively does per query. It is
deliberately generous to the baseline: it skips query encoding and the
stage-2 span rescore that the TPU number includes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax


def cpu_mips_qps(vecs_int8: np.ndarray, batch: int, top_k: int,
                 offset: float, scale: float, n_batches: int = 2) -> float:
    """Measured CPU baseline: SQ8 flat MIPS scan (dequant + sgemm + top-k).

    Chunked so the float working set stays cache-friendly; BLAS uses all
    host cores. Same corpus, batch size, and top-k as the TPU path."""
    n, d = vecs_int8.shape
    rng = np.random.default_rng(7)
    chunk = 65536
    times = []
    for bi in range(n_batches + 1):  # first batch = warmup
        q = rng.normal(-2, 1, (batch, d)).astype(np.float32)
        t0 = time.perf_counter()
        best_s = np.full((batch, top_k), -np.inf, np.float32)
        best_i = np.zeros((batch, top_k), np.int64)
        for c0 in range(0, n, chunk):
            blk = vecs_int8[c0:c0 + chunk].astype(np.float32)
            blk /= scale
            s = q @ blk.T + (q.sum(1, keepdims=True) * offset)
            part = np.argpartition(s, -top_k, axis=1)[:, -top_k:]
            ps = np.take_along_axis(s, part, axis=1)
            cat_s = np.concatenate([best_s, ps], axis=1)
            cat_i = np.concatenate([best_i, part + c0], axis=1)
            sel = np.argpartition(cat_s, -top_k, axis=1)[:, -top_k:]
            best_s = np.take_along_axis(cat_s, sel, axis=1)
            best_i = np.take_along_axis(cat_i, sel, axis=1)
        if bi > 0:
            times.append(time.perf_counter() - t0)
    return batch / (sum(times) / len(times))


def main():
    from densephrases_tpu.index.search import MIPS
    from densephrases_tpu.index.store import DocMeta, StoreWriter
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import init_encoder_params
    from densephrases_tpu.ops.quant import float_to_int8
    import tempfile

    config = BertConfig()  # BERT-base geometry
    params = init_encoder_params(jax.random.PRNGKey(0), config)

    # ---- synthetic corpus: 1M phrase vectors over 10k docs (768-d int8)
    rng = np.random.default_rng(0)
    n_docs, vecs_per_doc, d = 10_000, 100, config.hidden_size
    with tempfile.TemporaryDirectory() as tmp:
        writer = StoreWriter(tmp + "/store", d)
        w2cs = np.arange(vecs_per_doc, dtype=np.int32) * 5
        w2ce = w2cs + 4
        f2o = np.arange(vecs_per_doc, dtype=np.int32)
        ctx = " ".join(["word"] * (vecs_per_doc + 2))
        block = 200  # docs per generated block (rng dominates otherwise)
        for b0 in range(0, n_docs, block):
            blk = float_to_int8(rng.normal(
                -2, 1, (block * vecs_per_doc, d)).astype(np.float32))
            for j in range(block):
                writer.add_doc(
                    DocMeta(doc_id=b0 + j, title=f"doc{b0 + j}", context=ctx,
                            word2char_start=w2cs, word2char_end=w2ce,
                            f2o_start=f2o),
                    blk[j * vecs_per_doc:(j + 1) * vecs_per_doc],
                )
        store = writer.finalize()
        mips = MIPS(store)

        # ---- fused serve path: token ids → span ids in ONE dispatch
        from densephrases_tpu.data.tokenization import train_wordpiece_vocab
        from densephrases_tpu.model import DensePhrases
        from densephrases_tpu.serve.fused import FusedServer

        tok = train_wordpiece_vocab(["benchmark query words " * 40],
                                    vocab_size=600)
        model = DensePhrases(params, config, tok, mips, max_query_length=32)
        fused = FusedServer(model)
        batch, top_k = 64, 10
        queries = [f"benchmark query number {i} words" for i in range(batch)]

        def one_batch():
            return fused.search(queries, top_k=top_k, aggregate=True)

        # Warmup (5 batches, excluded — ref: run_demo.py:331-335)
        for _ in range(5):
            one_batch()

        # median-of-5 windows of 8 batches (tunnel latency fluctuates);
        # set DPH_TRACE_DIR to capture a jax.profiler trace of the windows.
        # Steady-state serving keeps 2 dispatches in flight
        # (FusedServer.search_pipelined) so host assembly and dispatch
        # latency overlap device compute; the sync (1-in-flight) number is
        # reported alongside as `value_sync`.
        from densephrases_tpu.utils.profiling import xla_trace
        import os

        n_batches = 8
        windows, windows_sync = [], []
        with xla_trace(os.environ.get("DPH_TRACE_DIR")):
            for _ in range(5):
                t0 = time.perf_counter()
                fused.search_pipelined([queries] * n_batches, depth=2,
                                       top_k=top_k, aggregate=True)
                windows.append(time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_batches):
                    one_batch()
                windows_sync.append(time.perf_counter() - t0)
        elapsed = sorted(windows)[len(windows) // 2]
        elapsed_sync = sorted(windows_sync)[len(windows_sync) // 2]

        # measured CPU baseline over the same corpus (see cpu_mips_qps)
        baseline_qps = cpu_mips_qps(
            np.asarray(store.vecs[:]), batch, top_k,
            offset=store.offset, scale=store.scale)

    qps = n_batches * batch / elapsed
    print(json.dumps({
        "metric": "queries_per_sec_batch64_e2e",
        "value": round(qps, 2),
        "unit": "q/s",
        "value_sync": round(n_batches * batch / elapsed_sync, 2),
        "baseline": round(baseline_qps, 2),
        "vs_baseline": round(qps / baseline_qps, 2),
    }))


if __name__ == "__main__":
    main()
