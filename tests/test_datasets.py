"""Dataset construction utilities (NQ reader, merging, filters, stats)."""

import json

from densephrases_tpu.preprocess.datasets import (
    SimpleTokenizer,
    answer_type,
    filter_noans,
    filter_wiki,
    merge_openqa,
    nq_to_squad,
    stat_entities,
    tsv_to_corpus,
)


def test_simple_tokenizer():
    t = SimpleTokenizer()
    assert t.tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert t.words("Ángel 42") == ["ángel", "42"]


def test_nq_to_squad(tmp_path):
    doc = "<P> The answer is forty two . </P>"
    row = {
        "question_text": "what is the answer",
        "document_title": "T",
        "document_text": doc,
        "annotations": [{
            "long_answer": {"start_token": 0, "end_token": 8},
            "short_answers": [{"start_token": 4, "end_token": 6}],
        }],
    }
    p = tmp_path / "nq.jsonl"
    p.write_text(json.dumps(row) + "\n")
    out = str(tmp_path / "squad.json")
    n = nq_to_squad(str(p), out)
    assert n == 1
    data = json.load(open(out))["data"][0]
    ctx = data["paragraphs"][0]["context"]
    qa = data["paragraphs"][0]["qas"][0]
    a = qa["answers"][0]
    assert "<P>" not in ctx
    assert ctx[a["answer_start"]:a["answer_start"] + len(a["text"])] == a["text"]
    assert a["text"] == "forty two"


def test_merge_and_filter(tmp_path):
    f1 = tmp_path / "a.json"
    json.dump({"data": [{"question": "Q1?", "answers": ["x"]},
                        {"question": "Q2?", "answers": []}]}, open(f1, "w"))
    f2 = tmp_path / "b.jsonl"
    f2.write_text(json.dumps({"question": "q1?", "answers": ["y"]}) + "\n")
    out = str(tmp_path / "m.json")
    n = merge_openqa([str(f1), str(f2)], out)  # q1 dedup'd (case-insensitive)
    assert n == 2
    out2 = str(tmp_path / "noans.json")
    assert filter_noans(out, out2) == 1


def test_filter_wiki(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    json.dump({"data": [
        {"title": "Good", "paragraphs": [{"context": "text " * 20}]},
        {"title": "List of stuff", "paragraphs": [{"context": "text " * 20}]},
    ]}, open(d / "0000.json", "w"))
    kept = filter_wiki(str(d), str(tmp_path / "out"))
    assert kept == 1


def test_answer_stats():
    assert answer_type("42") == "NUM"
    assert answer_type("March 2009") == "DATE"
    assert answer_type("Kevin Skinner") == "PROPER"
    assert answer_type("a blue whale") == "OTHER"


def test_tsv_to_corpus(tmp_path):
    tsv = tmp_path / "p.tsv"
    tsv.write_text("id\ttext\ttitle\n1\tfirst passage\tA\n2\tsecond\tB\n")
    n = tsv_to_corpus(str(tsv), str(tmp_path / "corpus"))
    assert n == 1
    data = json.load(open(tmp_path / "corpus" / "0000.json"))["data"]
    assert [d["title"] for d in data] == ["A", "B"]
