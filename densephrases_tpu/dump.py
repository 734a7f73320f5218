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
) -> PhraseStore:
    """docs: iterable of {'doc_id': int, 'title': str, 'paragraphs': [str]}.

    first_passage: index only each document's first paragraph
    (ref: build_phrase_index.py:204-210 first_passage mode).

    Windows from consecutive docs are batched together for MXU efficiency;
    per-doc vectors are reassembled on the host, filtered, quantized and
    appended to the store. Resume: docs already in the store are skipped
    (ref: generate_phrase_vecs.py:64-71).
    """
    hidden = config.hidden_size
    writer = StoreWriter(store_path, hidden, offset, scale)

    # Build features for all docs (host-side, cheap relative to encode).
    all_feats: List[ContextFeatures] = []
    doc_ctxs: Dict[int, DocContext] = {}
    doc_order: List[int] = []
    for doc in docs:
        did = int(doc["doc_id"])
        if writer.has_doc(did):
            continue
        paragraphs = doc["paragraphs"][:1] if first_passage else doc["paragraphs"]
        feats, doc_ctx = convert_context_to_features(
            did, doc.get("title", ""), paragraphs, tokenizer,
            max_seq_length=max_seq_length, append_title=append_title)
        all_feats.extend(feats)
        doc_ctxs[did] = doc_ctx
        doc_order.append(did)

    if not all_feats:
        return writer.finalize()

    # Streaming batched forward: windows are doc-ordered, so a document can
    # be flushed as soon as the stream moves past its last window — host
    # memory stays O(batch + one document), not O(corpus)
    # (role parity with the reference's streaming writer pipeline,
    # ref: embed_utils.py:201-301, minus the process/thread queues).
    pending: Dict[int, List[np.ndarray]] = {}

    def flush_doc(did: int):
        parts = pending.pop(did)
        doc_vecs = np.concatenate([p[0] for p in parts], axis=0)
        doc_fs = np.concatenate([p[1] for p in parts], axis=0)
        doc_fe = np.concatenate([p[2] for p in parts], axis=0)
        codes, f2o = filter_and_quantize(
            doc_vecs, doc_fs, doc_fe, filter_threshold, offset, scale)
        ctx = doc_ctxs[did]
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

    n = len(all_feats)
    open_doc: Optional[int] = None
    for b0 in range(0, n, batch_size):
        chunk = all_feats[b0: b0 + batch_size]
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

    store = writer.finalize()
    logger.info("dumped %d docs, %d vectors to %s",
                store.num_docs, store.n_vecs, store_path)
    return store
