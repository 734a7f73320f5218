"""Tests for preprocessing, store tools, parallel orchestration, analysis."""

import json
import os

import jax
import numpy as np
import pytest

from densephrases_tpu.index.store import DocMeta, StoreWriter
from densephrases_tpu.preprocess.doc_db import DocDB, build_db
from densephrases_tpu.preprocess.wiki import (
    concat_small_docs,
    create_openqa,
    db_to_squad_docs,
    keep_article,
    split_paragraphs,
)
from densephrases_tpu.tools.analysis import analyze_predictions, compare_predictions
from densephrases_tpu.tools.benchmark import benchmark_store_read, create_benchmark_data
from densephrases_tpu.tools.parallel_dump import bin_by_size, make_ranges
from densephrases_tpu.tools.store_tools import (
    check_store,
    filter_store,
    split_store,
    store_stats,
)


def _make_store(path, n_docs=6, vecs_per_doc=10, dim=16):
    writer = StoreWriter(str(path), dim)
    rng = np.random.default_rng(0)
    for d in range(n_docs):
        writer.add_doc(DocMeta(
            doc_id=d, title=f"t{d}", context="w " * (vecs_per_doc * 2),
            word2char_start=np.arange(vecs_per_doc, dtype=np.int32) * 2,
            word2char_end=np.arange(vecs_per_doc, dtype=np.int32) * 2 + 1,
            f2o_start=np.arange(vecs_per_doc, dtype=np.int32)),
            rng.integers(-128, 127, (vecs_per_doc, dim)).astype(np.int8))
    return writer.finalize()


# ------------------------------------------------------------- preprocess
def test_doc_db_and_wiki_pipeline(tmp_path):
    jsonl_dir = tmp_path / "extracted"
    jsonl_dir.mkdir()
    rows = [
        {"id": "1", "title": "Good Article",
         "text": "First paragraph with enough text to be kept around.\n"
                 "Second paragraph also has plenty of characters in it."},
        {"id": "2", "title": "List of things", "text": "a list " * 20},
        {"id": "3", "title": "Stub", "text": "too short"},
    ]
    with open(jsonl_dir / "wiki_00", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    db_path = str(tmp_path / "docs.db")
    n = build_db(db_path, str(jsonl_dir))
    assert n == 3
    with DocDB(db_path) as db:
        assert set(db.doc_ids()) == {"1", "2", "3"}
        assert "First paragraph" in db.get_doc_text("1")

    out_dir = str(tmp_path / "squad")
    n_files = db_to_squad_docs(db_path, out_dir)
    assert n_files == 1
    data = json.load(open(os.path.join(out_dir, "0000.json")))["data"]
    # blacklist removed 'List of things'; stub removed by min length
    assert [d["title"] for d in data] == ["Good Article"]
    assert len(data[0]["paragraphs"]) == 2

    cat_dir = str(tmp_path / "cat")
    assert concat_small_docs(out_dir, cat_dir, min_words=5) == 1


def test_keep_article_filters():
    assert not keep_article("Foo (disambiguation)", "long enough text " * 10)
    assert not keep_article("List of rivers", "long enough text " * 10)
    assert keep_article("Normal", "long enough text " * 10)
    assert split_paragraphs("short\n" + "a proper paragraph with text " * 2) != []


def test_create_openqa(tmp_path):
    out = str(tmp_path / "open.json")
    n = create_openqa([
        {"question": "q1?", "answers": [{"text": "a1"}]},
    ], out, input_type="squad")
    assert n == 1
    data = json.load(open(out))["data"]
    assert data[0]["answers"] == ["a1"]


# ------------------------------------------------------------- store tools
def test_check_store_ok_and_detects_corruption(tmp_path):
    store = _make_store(tmp_path / "s")
    report = check_store(str(tmp_path / "s"))
    assert report["ok"], report["problems"]
    # corrupt: truncate vecs file
    with open(tmp_path / "s" / "vecs.int8", "r+b") as f:
        f.truncate(10)
    with pytest.raises(Exception):
        check_store(str(tmp_path / "s"))


def test_filter_and_split_store(tmp_path):
    _make_store(tmp_path / "s")
    filtered = filter_store(str(tmp_path / "s"), str(tmp_path / "f"),
                            keep_fraction=0.5)
    assert filtered.n_vecs == 30  # 6 docs × 5 kept
    shards = split_store(str(tmp_path / "s"), str(tmp_path / "shards"), 3)
    assert len(shards) == 3
    stats = store_stats(str(tmp_path / "s"))
    assert stats["num_docs"] == 6 and stats["vecs_per_doc_mean"] == 10.0


# ------------------------------------------------------------- parallel
def test_ranges_and_bins():
    assert make_ranges(10, 3) == [(0, 4), (4, 8), (8, 10)]
    bins = bin_by_size({"a": 10, "b": 9, "c": 1, "d": 1}, 2)
    totals = sorted(sum({"a": 10, "b": 9, "c": 1, "d": 1}[x] for x in b)
                    for b in bins)
    assert totals == [10, 11]


def test_parallel_dump_dry_run(tmp_path):
    from densephrases_tpu.tools.parallel_dump import run_parallel_dump

    (tmp_path / "data").mkdir()
    for i in range(4):
        json.dump({"data": []}, open(tmp_path / "data" / f"{i}.json", "w"))
    cmds = run_parallel_dump(str(tmp_path / "data"), str(tmp_path / "dump"),
                             "enc", n_workers=2, dry_run=True)
    assert len(cmds) == 2
    assert "--predict_file" in cmds[0] and "0:2" in cmds[0]


# ------------------------------------------------------------- analysis
def test_analysis_and_compare(tmp_path):
    preds_a = {"1": {"question": "q", "prediction": ["Paris", "x"],
                     "answers": ["Paris"]},
               "2": {"question": "q2", "prediction": ["wrong", "Rome"],
                     "answers": ["Rome"]}}
    preds_b = {"1": {"question": "q", "prediction": ["nope"],
                     "answers": ["Paris"]},
               "2": {"question": "q2", "prediction": ["Rome"],
                     "answers": ["Rome"]}}
    pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    json.dump(preds_a, open(pa, "w"))
    json.dump(preds_b, open(pb, "w"))
    rep = analyze_predictions(pa)
    assert rep["em_top1"] == 50.0 and rep["em_topk"] == 100.0
    cmp = compare_predictions(pa, pb)
    assert cmp["a_only"] == 1 and cmp["b_only"] == 1


# ------------------------------------------------------------- benchmark
def test_benchmark_store_read(tmp_path):
    _make_store(tmp_path / "s", n_docs=10, vecs_per_doc=50)
    m = benchmark_store_read(str(tmp_path / "s"), n_reads=100, window=5)
    assert m["reads_per_sec"] > 0


def test_create_benchmark_data(tmp_path):
    qa = {"data": [{"id": str(i), "question": f"q{i}", "answers": [f"a{i}"]}
                   for i in range(30)]}
    qa_path = str(tmp_path / "qa.json")
    json.dump(qa, open(qa_path, "w"))
    n = create_benchmark_data(qa_path, str(tmp_path / "bench"), n_questions=10)
    assert n == 10
    assert os.path.exists(str(tmp_path / "bench_denspi.json"))
    assert os.path.exists(str(tmp_path / "bench_dpr.csv"))
    assert os.path.exists(str(tmp_path / "bench_orqa.jsonl"))


# ------------------------------------------------------------- cross-encoder
def test_cross_encoder_training_runs():
    from densephrases_tpu.data.rc_dataset import convert_rc_examples
    from densephrases_tpu.data.tokenization import train_wordpiece_vocab
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.train.cross_encoder import train_cross_encoder

    ctx = "the quick brown fox jumps over the lazy dog again and again"
    examples = [{"qid": str(i), "question": "what jumps", "title": "T",
                 "context": ctx, "answer_text": "fox",
                 "answer_start": ctx.index("fox")} for i in range(4)]
    tok = train_wordpiece_vocab([ctx], vocab_size=300)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    feats = convert_rc_examples(examples, tok, max_seq_length=48,
                                doc_stride=24, max_query_length=12,
                                with_teacher=True)
    params, losses = train_cross_encoder(cfg, feats, epochs=2, batch_size=2,
                                         lr=5e-4, attn_impl="xla")
    assert "cross" in params and "qa_outputs" in params
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ------------------------------------------------- scale-bench corpus gen
def test_gen_corpus_device_and_cache(tmp_path):
    """Device-side clustered corpus generator (tiny shapes on CPU):
    distribution contract + memmap cache round-trip + .done marker."""
    from densephrases_tpu.tools.bench_ivf_scale import (
        cache_corpus,
        gen_corpus_device,
    )

    codes = gen_corpus_device(n=2048, d=32, n_clusters=8, seed=3, block=512)
    codes = np.asarray(codes)
    assert codes.shape == (2048, 32) and codes.dtype == np.int8
    # affine contract: centers ~ N(-2, 1) quantize near code 0 (offset -2)
    floats = codes.astype(np.float32) / 20.0 - 2.0
    assert -3.5 < floats.mean() < -0.5
    # clustered: nearest-neighbor gap within the corpus is much smaller
    # than the typical inter-row distance
    d2 = ((floats[:64, None, :] - floats[None, :256, :]) ** 2).sum(-1)
    np.fill_diagonal(d2[:, :64], np.inf)
    assert np.median(d2.min(1)) < 0.25 * np.median(np.median(d2, 1))

    path = str(tmp_path / "corpus.npy")
    cache_corpus(jax.numpy.asarray(codes), path, block=512)
    assert os.path.exists(path + ".done")
    mm = np.load(path, mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(mm), codes)
