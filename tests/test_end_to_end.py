"""End-to-end slice test on the bundled custom-index example corpus.

Pipeline under test: tokenizer training → window features → phrase dump →
flat store → on-device MIPS (two-stage) → char-offset answer extraction →
aggregation. The encoder is a tiny randomly-initialized model, so retrieval
*quality* is validated with an oracle: query vectors constructed from the
stored phrase vectors themselves must retrieve exactly their own span and the
extracted answer string must match the corpus text at that span.
"""

import json

import numpy as np
import pytest

import jax

from densephrases_tpu.data.features import convert_questions_to_features
from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.dump import dump_phrases
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.index.store import PhraseStore
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.ops.quant import int8_to_float

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only

ARTICLES = "/root/reference/examples/create-custom-index/articles.json"


@pytest.fixture(scope="module")
def corpus():
    with open(ARTICLES) as f:
        data = json.load(f)["data"]
    docs = []
    for i, art in enumerate(data[:3]):
        docs.append({
            "doc_id": i,
            "title": art["title"],
            "paragraphs": [p["context"] for p in art["paragraphs"][:4]],
        })
    return docs


@pytest.fixture(scope="module")
def tokenizer(corpus):
    texts = [p for d in corpus for p in d["paragraphs"]]
    return train_wordpiece_vocab(texts, vocab_size=2000)


@pytest.fixture(scope="module")
def setup(tmp_path_factory, corpus, tokenizer):
    cfg = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path_factory.mktemp("e2e") / "store")
    store = dump_phrases(
        params, cfg, tokenizer, corpus, path,
        max_seq_length=128, batch_size=4, attn_impl="xla")
    return cfg, params, store


def test_dump_produces_consistent_store(setup, corpus):
    _, _, store = setup
    assert store.num_docs == len(corpus)
    for dpos in range(store.num_docs):
        meta = store.meta(dpos)
        n_vecs = store.doc_bases[dpos + 1] - store.doc_bases[dpos]
        assert len(meta.f2o_start) == n_vecs
        # char offsets must be within the context and non-decreasing per token
        w2cs, w2ce = meta.word2char_start, meta.word2char_end
        assert (w2cs >= 0).all() and (w2ce <= len(meta.context)).all()
        assert (w2ce > w2cs).all()
        # context contains the [PAR] separator between paragraphs
        assert " [PAR] " in meta.context


def test_oracle_phrase_retrieval(setup):
    """Query = the stored vector of a known span → that span must come back
    as top-1 and its answer string must equal the context slice."""
    cfg, params, store = setup
    mips = MIPS(store)
    rng = np.random.default_rng(0)

    hits = 0
    trials = 10
    for t in range(trials):
        dpos = int(rng.integers(0, store.num_docs))
        meta = store.meta(dpos)
        b0, b1 = int(store.doc_bases[dpos]), int(store.doc_bases[dpos + 1])
        if b1 - b0 < 4:
            continue
        s_local = int(rng.integers(0, b1 - b0 - 3))
        e_local = s_local + int(rng.integers(0, 3))
        s_vec = int8_to_float(np.asarray(store.vecs[b0 + s_local]))
        e_vec = int8_to_float(np.asarray(store.vecs[b0 + e_local]))
        query = np.concatenate([s_vec, e_vec])[None, :]

        out = mips.search(query, top_k=5, max_answer_length=10)[0]
        assert len(out) > 0
        top = out[0]
        # answer string equals context slice at reported char positions
        assert top["answer"] == top["context"][top["start_pos"]:top["end_pos"]]
        if top["doc_idx"] == int(store.doc_ids[dpos]) and top["start_idx"] == s_local:
            hits += 1
    assert hits >= trials * 0.7  # allow rare quantization near-ties


def test_retrieval_units_and_aggregation(setup, tokenizer):
    cfg, params, store = setup
    from densephrases_tpu.model import DensePhrases

    mips = MIPS(store)
    dp = DensePhrases(params, cfg, tokenizer, mips, max_query_length=32)
    # random weights: just exercise all units end-to-end
    for unit in ["phrase", "sentence", "paragraph", "document"]:
        answers = dp.search("who won season 4", retrieval_unit=unit, top_k=3)
        assert isinstance(answers, list)
        assert len(answers) <= 3
        assert all(isinstance(a, str) for a in answers)
    answers, meta = dp.search(["a question", "another question"],
                              retrieval_unit="phrase", top_k=2, return_meta=True)
    assert len(answers) == 2 and len(meta) == 2


def test_sentence_adjustment(setup):
    cfg, params, store = setup
    mips = MIPS(store)
    each = {
        "context": "First sentence here. Second one is longer. Third ends it.",
        "start_pos": 21, "end_pos": 27, "title": ["t"], "score": 1.0,
    }
    adj = MIPS.adjust_sent(dict(each))
    assert adj["context"].startswith("Second")
    assert adj["context"][adj["start_pos"]:adj["end_pos"]] == \
        each["context"][each["start_pos"]:each["end_pos"]]


def test_dump_is_streaming(tmp_path, corpus, tokenizer):
    """Host memory must stay O(batch + one open doc): features are produced
    through a bounded queue, and vectors land on disk while later docs are
    still being tokenized (ref streams per-doc appends,
    embed_utils.py:201-301)."""
    import os

    cfg = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    # replicate the corpus into many small docs
    many = []
    for rep in range(12):
        for d in corpus:
            many.append({"doc_id": rep * 10 + d["doc_id"],
                         "title": d["title"],
                         "paragraphs": d["paragraphs"][:1]})
    path = str(tmp_path / "stream_store")
    vec_file = os.path.join(path, "vecs.int8")
    bytes_when_pulled = []

    def doc_gen():
        for d in many:
            bytes_when_pulled.append(
                os.path.getsize(vec_file) if os.path.exists(vec_file) else 0)
            yield d

    stats = {}
    store = dump_phrases(params, cfg, tokenizer, doc_gen(), path,
                         max_seq_length=128, batch_size=4, attn_impl="xla",
                         tokenize_ahead=2, _stats=stats)
    assert store.num_docs == len(many)
    # vectors were flushed to disk before the corpus was fully tokenized
    assert bytes_when_pulled[-1] > 0, (
        "no vector bytes on disk by the time the last doc was pulled — "
        "dump is not streaming")
    # feature buffer stayed O(batch + one doc), not O(corpus windows)
    assert stats["peak_buffered_features"] < 4 + 16, stats
    assert stats["peak_open_docs"] < len(many) // 2, stats
