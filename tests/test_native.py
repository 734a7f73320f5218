"""Native C++ store runtime tests (with fallback-path coverage)."""

import numpy as np
import pytest

from densephrases_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libdpstore.so failed"


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.integers(-128, 127, (5000, 96)).astype(np.int8)
    idx = rng.integers(0, 5000, (37, 11))
    out = native.gather_rows(m, idx)
    np.testing.assert_array_equal(out, m[idx])


def test_gather_rows_out_of_range_zeros():
    m = np.ones((10, 8), np.int8)
    idx = np.asarray([0, 11, -1, 9])
    out = native.gather_rows(m, idx)
    np.testing.assert_array_equal(out[0], np.ones(8))
    if native.available():  # native zeroes OOB rows
        np.testing.assert_array_equal(out[1], np.zeros(8))
        np.testing.assert_array_equal(out[2], np.zeros(8))


def test_zlib_batch_round_trip():
    rng = np.random.default_rng(1)
    bufs = [rng.integers(0, 5, size=rng.integers(10, 5000)).astype(np.uint8).tobytes()
            for _ in range(64)]
    comp = native.compress_batch(bufs)
    assert all(len(c) < len(b) + 64 for c, b in zip(comp, bufs))
    back = native.decompress_batch(comp, [len(b) for b in bufs])
    assert back == bufs


def test_zlib_batch_interop_with_python_zlib():
    import zlib

    bufs = [b"hello world " * 100, b"abc" * 7]
    comp = native.compress_batch(bufs)
    # python zlib must be able to read native-compressed data and vice versa
    assert [zlib.decompress(c) for c in comp] == bufs
    pycomp = [zlib.compress(b) for b in bufs]
    assert native.decompress_batch(pycomp, [len(b) for b in bufs]) == bufs


def test_file_io_round_trip(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.integers(-128, 127, (1000, 64)).astype(np.int8)
    p = str(tmp_path / "vecs.bin")
    n = native.write_bytes(p, data)
    assert n == data.size
    back = native.read_bytes(p, data.size).view(np.int8).reshape(data.shape)
    np.testing.assert_array_equal(back, data)


def test_store_preload_metas(tmp_path):
    from densephrases_tpu.index.store import DocMeta, StoreWriter

    writer = StoreWriter(str(tmp_path / "s"), 16)
    for d in range(20):
        writer.add_doc(DocMeta(
            doc_id=d, title=f"t{d}", context=f"doc {d} content " * 30,
            word2char_start=np.arange(5, dtype=np.int32),
            word2char_end=np.arange(5, dtype=np.int32) + 1,
            f2o_start=np.arange(5, dtype=np.int32)),
            np.zeros((5, 16), np.int8))
    store = writer.finalize()
    store.preload_metas()
    assert len(store._meta_cache) == 20
    m = store.meta(7)
    assert m.context.startswith("doc 7 content")
    np.testing.assert_array_equal(m.f2o_start, np.arange(5))
