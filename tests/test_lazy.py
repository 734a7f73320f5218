"""Streaming dataset + hard-negative pool tests."""

import json

import numpy as np

from densephrases_tpu.data.lazy import LazyRCDataset, PassagePool, read_qa_jsonl
from densephrases_tpu.data.tokenization import train_wordpiece_vocab


def test_read_qa_jsonl_rank_sharding(tmp_path):
    path = str(tmp_path / "qa.jsonl")
    with open(path, "w") as f:
        for i in range(10):
            f.write(json.dumps({"id": i, "question": f"q{i}",
                                "context": "ctx", "answers": ["a"]}) + "\n")
    r0 = list(read_qa_jsonl(path, rank=0, world_size=2))
    r1 = list(read_qa_jsonl(path, rank=1, world_size=2))
    assert len(r0) == len(r1) == 5
    assert {e["qid"] for e in r0} | {e["qid"] for e in r1} == \
        {str(i) for i in range(10)}
    skipped = list(read_qa_jsonl(path, rank=0, world_size=2, skip=2))
    assert skipped[0]["qid"] == r0[2]["qid"]


def test_lazy_dataset_with_negatives(tmp_path):
    ctx = "the quick brown fox jumps over the lazy dog near the river bank"
    tok = train_wordpiece_vocab([ctx], vocab_size=300)

    tsv = str(tmp_path / "psgs.tsv")
    with open(tsv, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(5):
            f.write(f"{i}\tnegative passage number {i} with text\tT{i}\n")
    pool = PassagePool(tsv)
    assert len(pool) == 5

    def gen():
        for i in range(7):
            yield {"qid": str(i), "question": "what jumps", "title": "T",
                   "context": ctx, "answer_text": "fox",
                   "answer_start": ctx.index("fox")}

    ds = LazyRCDataset(gen(), tok, batch_size=3, max_seq_length=64,
                       doc_stride=32, max_query_length=12,
                       negative_pool=pool)
    batches = list(ds)
    assert len(batches) == 2  # 7 examples → two full batches of 3
    b = batches[0]
    assert b["input_ids"].shape[0] == 3
    assert "neg_input_ids" in b and b["neg_input_ids"].shape[0] == 3
    assert (b["start_positions"] > 0).all()
