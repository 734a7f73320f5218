"""Fused single-dispatch serve path must match the modular pipeline."""

import jax
import numpy as np
import pytest

from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.dump import dump_phrases
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.model import DensePhrases
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.serve.fused import FusedServer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    docs = [{"doc_id": i, "title": f"doc{i}",
             "paragraphs": [f"document {i} text about topic {i} "
                            f"with several words to embed here"]}
            for i in range(6)]
    tok = train_wordpiece_vocab(
        [p for d in docs for p in d["paragraphs"]], vocab_size=400)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    store = dump_phrases(params, cfg, tok, docs,
                         str(tmp_path_factory.mktemp("fused") / "s"),
                         max_seq_length=64, batch_size=4, attn_impl="xla")
    model = DensePhrases(params, cfg, tok, MIPS(store), max_query_length=16,
                         attn_impl="xla")
    return model


def test_fused_matches_modular(setup):
    model = setup
    queries = ["what is topic three", "words to embed"]
    fused = FusedServer(model)
    out_f = fused.search(queries, top_k=5, aggregate=True)
    _, out_m = model.search(queries, retrieval_unit="phrase", top_k=5,
                            return_meta=True)
    assert len(out_f) == len(out_m) == 2
    for rf, rm in zip(out_f, out_m):
        sf = {(r["doc_idx"], r["start_idx"], r["end_idx"]) for r in rf[:5]}
        sm = {(r["doc_idx"], r["start_idx"], r["end_idx"]) for r in rm[:5]}
        assert len(sf & sm) >= min(len(sf), len(sm)) * 0.8
        for r in rf:
            assert r["answer"] == r["context"][r["start_pos"]:r["end_pos"]]


def test_pipelined_matches_sync(setup):
    model = setup
    fused = FusedServer(model)
    batches = [["what is topic three", "words to embed"],
               ["document text", "topic five here"],
               ["several words", "embed here now"]]
    ref = [fused.search(b, top_k=4, aggregate=True) for b in batches]
    out = fused.search_pipelined(batches, depth=2, top_k=4, aggregate=True)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        for ro, rr in zip(o, r):
            assert [(x["doc_idx"], x["start_idx"], x["end_idx"])
                    for x in ro] == \
                   [(x["doc_idx"], x["start_idx"], x["end_idx"])
                    for x in rr]


def test_pipelined_uneven_batches(setup):
    # real request streams are not uniform: mixed batch sizes must work
    model = setup
    fused = FusedServer(model)
    batches = [["what is topic three"],
               ["document text", "topic five here", "several words"],
               ["embed here now", "words to embed"]]
    out = fused.search_pipelined(batches, depth=2, top_k=3, aggregate=True)
    assert [len(o) for o in out] == [1, 3, 2]
    for o in out:
        for r in o:
            assert r and r[0]["answer"] == \
                r[0]["context"][r[0]["start_pos"]:r[0]["end_pos"]]
