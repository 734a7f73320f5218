"""Phrase dump: run the phrase tower over a corpus and write the store.

TPU-native equivalent of the offline dump pipeline
(ref: generate_phrase_vecs.py:45-147 streaming forward;
embed_utils.py:201-301 writer with 10 processes + 10 threads). Here the
forward is one jitted batched function (windows from many docs batched
together), filtering/quantization run as vectorized host numpy, and the
store writer is the flat resumable StoreWriter — no queue pipeline needed
because the per-doc metadata assembly is exact-offset bookkeeping, not
alignment heuristics.
"""

from __future__ import annotations

import functools
import logging
import queue
import threading
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.data.features import (
    ContextFeatures,
    DocContext,
    convert_context_to_features,
)
from densephrases_tpu.data.tokenization import WordPieceTokenizer
from densephrases_tpu.index.store import DocMeta, PhraseStore, StoreWriter
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import embed_phrase
from densephrases_tpu.ops.quant import float_to_int8

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("config", "attn_impl"))
def _phrase_forward(params, input_ids, attention_mask, token_type_ids,
                    *, config: BertConfig, attn_impl: str = "auto"):
    start, _end, f_start, f_end = embed_phrase(
        params, config, input_ids, attention_mask, token_type_ids,
        deterministic=True, attn_impl=attn_impl)
    return start, f_start, f_end


def filter_and_quantize(doc_vecs: np.ndarray, f_start: np.ndarray,
                        f_end: np.ndarray, threshold: float,
                        offset: float, scale: float):
    """Keep the union of start/end filter survivors
    (ref: embed_utils.py:117-138). Returns (codes int8, f2o int32)."""
    keep = (f_start > threshold) | (f_end > threshold)
    idxs = np.nonzero(keep)[0]
    if len(idxs) == 0:
        idxs = np.asarray([0], np.int64)  # keep one vector (ref behavior)
    codes = float_to_int8(doc_vecs[idxs], offset, scale)
    return codes, idxs.astype(np.int32)


def dump_phrases(
    params,
    config: BertConfig,
    tokenizer: WordPieceTokenizer,
    docs: Iterable[dict],
    store_path: str,
    *,
    max_seq_length: int = 512,
    filter_threshold: float = -1e8,
    batch_size: int = 16,
    offset: float = -2.0,
    scale: float = 20.0,
    attn_impl: str = "auto",
    append_title: bool = True,
    first_passage: bool = False,
    tokenize_ahead: int = 4,
    _stats: Optional[dict] = None,
) -> PhraseStore:
    """docs: iterable of {'doc_id': int, 'title': str, 'paragraphs': [str]}.

    first_passage: index only each document's first paragraph
    (ref: build_phrase_index.py:204-210 first_passage mode).

    Fully streaming: a tokenize-ahead thread converts docs to features into a
    bounded queue (``tokenize_ahead`` docs deep) while the device encodes the
    previous batch; per-doc vectors are reassembled on the host, filtered,
    quantized, and appended to the store the moment the window stream moves
    past the doc. Host memory is O(queue + batch + one open document) — never
    O(corpus) (role parity with the reference's streaming writer pipeline,
    ref: embed_utils.py:201-301, its 10-process/10-thread queues collapsed
    into one tokenizer thread because metadata here is exact bookkeeping).
    Resume: docs already in the store are skipped
    (ref: generate_phrase_vecs.py:64-71).

    tokenize_ahead: bound (in docs) on the tokenizer→encoder queue.
    _stats: optional dict; records peak buffered features/open docs (tests).
    """
    hidden = config.hidden_size
    writer = StoreWriter(store_path, hidden, offset, scale)

    q: "queue.Queue" = queue.Queue(maxsize=max(1, tokenize_ahead))

    def produce():
        try:
            for doc in docs:
                did = int(doc["doc_id"])
                if writer.has_doc(did):
                    continue
                paragraphs = (doc["paragraphs"][:1] if first_passage
                              else doc["paragraphs"])
                feats, doc_ctx = convert_context_to_features(
                    did, doc.get("title", ""), paragraphs, tokenizer,
                    max_seq_length=max_seq_length, append_title=append_title)
                if feats:
                    q.put((did, doc_ctx, feats))
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — surface in consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True,
                     name="dump-tokenize-ahead").start()

    doc_ctxs: Dict[int, DocContext] = {}
    pending: Dict[int, List[np.ndarray]] = {}
    buf: List[ContextFeatures] = []

    def flush_doc(did: int):
        parts = pending.pop(did)
        doc_vecs = np.concatenate([p[0] for p in parts], axis=0)
        doc_fs = np.concatenate([p[1] for p in parts], axis=0)
        doc_fe = np.concatenate([p[2] for p in parts], axis=0)
        codes, f2o = filter_and_quantize(
            doc_vecs, doc_fs, doc_fe, filter_threshold, offset, scale)
        ctx = doc_ctxs.pop(did)
        # word2char maps are per *token* position (ref: embed_utils.py:89-105):
        w2c_start = ctx.word_char_start[ctx.tok2word]
        w2c_end = ctx.word_char_end[ctx.tok2word]
        meta = DocMeta(
            doc_id=did, title=ctx.title, context=ctx.context,
            word2char_start=w2c_start.astype(np.int32),
            word2char_end=w2c_end.astype(np.int32),
            f2o_start=f2o,
        )
        writer.add_doc(meta, codes)

    done = False
    open_doc: Optional[int] = None
    peak_feats = peak_docs = 0
    while True:
        while not done and len(buf) < batch_size:
            item = q.get()
            if item is None:
                done = True
                break
            if isinstance(item, BaseException):
                raise item
            did, doc_ctx, feats = item
            doc_ctxs[did] = doc_ctx
            buf.extend(feats)
        if not buf:
            break
        peak_feats = max(peak_feats, len(buf))
        peak_docs = max(peak_docs, len(doc_ctxs))
        chunk, buf = buf[:batch_size], buf[batch_size:]
        ids = np.stack([f.input_ids for f in chunk])
        am = np.stack([f.attention_mask for f in chunk])
        tt = np.stack([f.token_type_ids for f in chunk])
        if len(chunk) < batch_size:
            extra = batch_size - len(chunk)
            ids = np.concatenate([ids, np.zeros((extra,) + ids.shape[1:], ids.dtype)])
            am = np.concatenate([am, np.zeros((extra,) + am.shape[1:], am.dtype)])
            tt = np.concatenate([tt, np.zeros((extra,) + tt.shape[1:], tt.dtype)])
        s, f_s, f_e = _phrase_forward(
            params, jnp.asarray(ids), jnp.asarray(am), jnp.asarray(tt),
            config=config, attn_impl=attn_impl)
        s, f_s, f_e = np.asarray(s), np.asarray(f_s), np.asarray(f_e)
        for j, f in enumerate(chunk):
            c0, c1 = f.content_start, f.content_start + f.content_len
            pending.setdefault(f.doc_id, []).append(
                (s[j, c0:c1], f_s[j, c0:c1], f_e[j, c0:c1]))
            if open_doc is not None and open_doc != f.doc_id \
                    and open_doc in pending:
                flush_doc(open_doc)
            open_doc = f.doc_id
    for did in list(pending):
        flush_doc(did)

    if _stats is not None:
        _stats["peak_buffered_features"] = peak_feats
        _stats["peak_open_docs"] = peak_docs

    store = writer.finalize()
    logger.info("dumped %d docs, %d vectors to %s",
                store.num_docs, store.n_vecs, store_path)
    return store
