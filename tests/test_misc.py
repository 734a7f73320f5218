"""Coverage for store merge, options parsing, profiling, metrics logging."""

import json
import time

import numpy as np

from densephrases_tpu.index.store import DocMeta, PhraseStore, StoreWriter
from densephrases_tpu.options import Options
from densephrases_tpu.ops.quant import float_to_int8
from densephrases_tpu.utils.metrics_log import MetricsLogger
from densephrases_tpu.utils.profiling import StageTimer


def _shard(path, doc_ids, dim=16):
    writer = StoreWriter(str(path), dim)
    rng = np.random.default_rng(doc_ids[0])
    for d in doc_ids:
        writer.add_doc(DocMeta(
            doc_id=d, title=f"t{d}", context="w w w w",
            word2char_start=np.arange(3, dtype=np.int32),
            word2char_end=np.arange(3, dtype=np.int32) + 1,
            f2o_start=np.arange(3, dtype=np.int32)),
            rng.integers(-128, 127, (3, dim)).astype(np.int8))
    return writer.finalize()


def test_store_merge_concatenates_shards(tmp_path):
    s1 = _shard(tmp_path / "a", [0, 1])
    s2 = _shard(tmp_path / "b", [2, 3, 4])
    merged = PhraseStore.merge([str(tmp_path / "a"), str(tmp_path / "b")],
                               str(tmp_path / "m"))
    assert merged.num_docs == 5
    assert merged.n_vecs == s1.n_vecs + s2.n_vecs
    np.testing.assert_array_equal(merged.doc_ids, [0, 1, 2, 3, 4])
    # shard contents preserved in order
    np.testing.assert_array_equal(merged.vec_rows(2), s2.vec_rows(0))
    assert merged.meta(3).title == "t3"


def test_options_cli_round_trip():
    opts = Options().parse([
        "--num_clusters", "777", "--fine_quant", "SQ8",
        "--learning_rate", "0.001", "--top_k", "33",
        "--qsft_top_k", "55", "--index_port", "1234",
        "--train_file", "x.json", "--draft",
    ])
    assert opts.index.num_clusters == 777
    assert opts.index.fine_quant == "SQ8"
    assert opts.train.learning_rate == 0.001
    assert opts.retrieval.top_k == 33
    assert opts.qsft.qsft_top_k == 55
    assert opts.demo.index_port == 1234
    assert opts.data.train_file == "x.json"
    assert opts.draft
    d = opts.to_dict()
    assert d["index"]["num_clusters"] == 777


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.01
    assert "b" in s
    t.reset()
    assert not t.summary()


def test_metrics_logger(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log(1, loss=2.5)
    m.log(2, loss=1.5, em=10.0)
    rows = m.read()
    assert len(rows) == 2
    assert rows[1]["em"] == 10.0 and rows[1]["step"] == 2
