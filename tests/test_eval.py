"""Tests for RC decoding, KILT metrics, passage recall."""

import jax
import numpy as np
import pytest

from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.eval.kilt import (
    _rouge_l,
    evaluate_kilt,
    recall_at_k,
    rprecision,
)
from densephrases_tpu.eval.passage import evaluate_passages, has_answer, to_fid_format
from densephrases_tpu.eval.rc import decode_spans, evaluate_rc
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params


# ---------------------------------------------------------------- rc decode
def test_decode_spans_picks_argmax_span():
    from densephrases_tpu.data.features import convert_context_to_features

    tok = train_wordpiece_vocab(
        ["alpha beta gamma delta epsilon zeta eta theta"], vocab_size=300)
    feats, ctx = convert_context_to_features(
        0, "", ["alpha beta gamma delta epsilon zeta eta theta"], tok,
        max_seq_length=32, append_title=False)
    f = feats[0]
    L = len(f.input_ids)
    s = np.full(L, -10.0)
    e = np.full(L, -10.0)
    # boost tokens for words "gamma delta" (positions 2..3 in content)
    s[f.content_start + 2] = 5.0
    e[f.content_start + 3] = 5.0
    spans = decode_spans(s, e, f, ctx, max_answer_length=5)
    assert spans[0]["text"] == "gamma delta"
    # char positions point into the context string
    assert ctx.context[spans[0]["start_pos"]:spans[0]["end_pos"]] == "gamma delta"


def test_decode_spans_filter_pruning():
    from densephrases_tpu.data.features import convert_context_to_features

    tok = train_wordpiece_vocab(["a b c d e f"], vocab_size=300)
    feats, ctx = convert_context_to_features(
        0, "", ["a b c d e f"], tok, max_seq_length=16, append_title=False)
    f = feats[0]
    L = len(f.input_ids)
    s = np.zeros(L)
    e = np.zeros(L)
    s[f.content_start] = 3.0
    e[f.content_start] = 3.0
    flt = np.full(L, -5.0)
    flt[f.content_start + 2] = 5.0  # only token 'c' survives
    spans = decode_spans(s, e, f, ctx, filter_start=flt, filter_end=flt,
                         filter_threshold=0.0)
    assert spans[0]["text"] == "c"


def test_evaluate_rc_runs():
    examples = [{
        "qid": "1", "question": "what is x",
        "title": "T", "context": "x is a letter of the alphabet used here",
        "answer_text": "letter", "answer_start": 7,
    }]
    tok = train_wordpiece_vocab([examples[0]["context"]], vocab_size=300)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    m = evaluate_rc(params, cfg, tok, examples, max_seq_length=48,
                    doc_stride=24, max_query_length=12, attn_impl="xla")
    assert set(m) == {"exact_match", "f1", "n"} and m["n"] == 1


# ---------------------------------------------------------------- kilt
def test_rouge_l():
    assert _rouge_l("the cat sat", "the cat sat") == 1.0
    assert _rouge_l("a b c", "x y z") == 0.0
    assert 0 < _rouge_l("the big cat", "the cat") < 1


def test_rprecision_and_recall():
    assert rprecision(["1", "2", "3"], [["1", "2"]]) == 1.0
    assert rprecision(["3", "1"], [["1", "2"]]) == 0.5
    assert recall_at_k(["1", "9"], [["1", "2"]], k=5) == 0.5


def test_evaluate_kilt():
    preds = [
        {"answer": "Paris", "provenance": ["10", "11"]},
        {"answer": "wrong", "provenance": ["99"]},
    ]
    golds = [
        {"answers": ["Paris"], "provenance": [["10"]]},
        {"answers": ["Right"], "provenance": [["12"]]},
    ]
    m = evaluate_kilt(preds, golds)
    assert m["em"] == 50.0
    assert m["rprec"] == 50.0
    assert m["kilt_em"] == 50.0  # only q1 has correct provenance AND answer


# ---------------------------------------------------------------- passage
def test_has_answer_and_recall():
    assert has_answer("The capital is Paris, of course", ["paris"])
    assert not has_answer("No answer here", ["paris"])
    results = [[{"context": "Paris is the capital", "title": ["t"],
                 "start_pos": 0, "end_pos": 5, "score": 1.0}],
               [{"context": "nothing relevant", "title": ["t"],
                 "start_pos": 0, "end_pos": 1, "score": 1.0}]]
    answers = [["Paris"], ["Madrid"]]
    m = evaluate_passages(results, answers, ks=(1,))
    assert m["recall@1"] == 50.0


def test_fid_format_with_markers(tmp_path):
    results = [[{"context": "Paris is nice", "title": ["France"],
                 "start_pos": 0, "end_pos": 5, "score": 2.0}]]
    rows = to_fid_format(["q"], [["Paris"]], results, mark_phrase=True,
                         out_path=str(tmp_path / "fid.json"))
    assert rows[0]["ctxs"][0]["text"] == "<e>Paris</e> is nice"
    assert (tmp_path / "fid.json").exists()


def test_candidate_restricted_eval():
    from densephrases_tpu.eval.retrieval import evaluate_retrieval

    class FakeModel:
        def search(self, qs, retrieval_unit, top_k, max_answer_length=10):
            return [["noise", "Paris", "junk"][:top_k] for _ in qs]

    pairs = [("capital of france", ["Paris"])]
    # without candidates, top-1 is 'noise' → EM@1 = 0
    m = evaluate_retrieval(FakeModel(), pairs, top_k=3)
    assert m["em_top1"] == 0.0
    # candidates restrict predictions to the vocabulary → 'Paris' promotes
    m2 = evaluate_retrieval(FakeModel(), pairs, top_k=3,
                            candidates=["Paris", "London"])
    assert m2["em_top1"] == 100.0
