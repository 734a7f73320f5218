"""Host-tiered serving: corpora larger than the device budget must return
the same results as the fully HBM-resident path."""

import numpy as np
import pytest

from densephrases_tpu.index.flat import FlatIndex
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.index.store import DocMeta, StoreWriter
from densephrases_tpu.index.tiered import TieredFlatIndex
from densephrases_tpu.ops.quant import float_to_int8


def _corpus(n=5000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(-2, 1, (n, d)).astype(np.float32)
    return float_to_int8(vecs)


@pytest.mark.parametrize("budget_rows", [0, 512, 3000, 10**9])
def test_tiered_matches_flat(budget_rows):
    codes = _corpus()
    d = codes.shape[1]
    rng = np.random.default_rng(1)
    queries = rng.normal(size=(7, d)).astype(np.float32)

    flat = FlatIndex(codes, chunk=512)
    tiered = TieredFlatIndex(codes, hbm_budget_bytes=budget_rows * d,
                             block_rows=700, chunk=512)
    fv, fi = flat.search(queries, top_k=9)
    tv, ti = tiered.search(queries, top_k=9)
    # same scoring math on both paths → ids identical except ties
    np.testing.assert_allclose(np.sort(tv, -1), np.sort(fv, -1),
                               rtol=1e-3, atol=1e-3)
    overlap = np.mean([
        len(set(fi[i].tolist()) & set(ti[i].tolist())) / fi.shape[1]
        for i in range(fi.shape[0])])
    assert overlap > 0.85, f"id overlap {overlap}"


def test_tiered_everything_in_overflow():
    codes = _corpus(n=1000)
    tiered = TieredFlatIndex(codes, hbm_budget_bytes=0, block_rows=128)
    assert tiered.n_resident == 0
    queries = np.random.default_rng(2).normal(
        size=(3, codes.shape[1])).astype(np.float32)
    vals, ids = tiered.search(queries, top_k=5)
    # exact per-block top_k + exact merge == exact brute force
    floats = codes.astype(np.float32) / 20.0 + (-2.0) * 0  # scale only
    # use the index's own dequant contract
    scores = (queries @ codes.T.astype(np.float32)) / 20.0 \
        + (-2.0) * queries.sum(-1, keepdims=True)
    want = np.sort(scores, axis=-1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.sort(vals, -1)[:, ::-1], want,
                               rtol=2e-2, atol=2e-2)


def _tiny_store(tmp_path, n_docs=6, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    w = StoreWriter(str(tmp_path / "st"), dim)
    for d in range(n_docs):
        nv = int(rng.integers(6, 20))
        vecs = rng.normal(-2, 1, (nv, dim)).astype(np.float32)
        meta = DocMeta(
            doc_id=d, title=f"doc{d}",
            context=" ".join(f"w{i}" for i in range(nv)),
            word2char_start=np.arange(nv, dtype=np.int32) * 3,
            word2char_end=np.arange(nv, dtype=np.int32) * 3 + 2,
            f2o_start=np.arange(nv, dtype=np.int32),
        )
        w.add_doc(meta, float_to_int8(vecs))
    return w.finalize(mmap=True)


def test_tiered_mips_two_stage_matches_resident(tmp_path):
    store = _tiny_store(tmp_path)
    d = store.dim
    rng = np.random.default_rng(4)
    qvec = rng.normal(size=(3, 2 * d)).astype(np.float32)

    mips_flat = MIPS(store)
    tiered_idx = TieredFlatIndex(
        np.asarray(store.vecs), store.offset, store.scale,
        hbm_budget_bytes=0, block_rows=16)
    mips_tiered = MIPS(store, index=tiered_idx)
    assert mips_tiered.tiered and mips_tiered.vecs_dev is None

    out_a = mips_flat.search(qvec, top_k=4, aggregate=False)
    out_b = mips_tiered.search(qvec, top_k=4, aggregate=False)
    for ra, rb in zip(out_a, out_b):
        ans_a = [(r["doc_idx"], r["start_pos"], r["end_pos"]) for r in ra]
        ans_b = [(r["doc_idx"], r["start_pos"], r["end_pos"]) for r in rb]
        # same candidates modulo score ties
        assert len(set(ans_a) & set(ans_b)) >= max(1, len(ans_a) - 1)
        for r_a, r_b in zip(ra, rb):
            assert abs(r_a["score"] - r_b["score"]) < 0.2


@pytest.mark.parametrize("fine_quant", ["SQ8", "SQ4"])
def test_tiered_ivf_matches_device_ivf(tmp_path, fine_quant):
    """Host-tier (memmap) IVF must return the same candidates as the fully
    device-resident IVF: same probed lists, same math — for both raw-code
    list formats (SQ8 int8 and SQ4 packed nibbles)."""
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.index.tiered import TieredIVF

    codes = _corpus(n=6000, d=64, seed=11)
    rng = np.random.default_rng(12)
    queries = rng.normal(-2, 1, (6, 64)).astype(np.float32)

    ivf = IVFIndex.build(codes, IVFConfig(num_clusters=64,
                                          fine_quant=fine_quant,
                                          kmeans_iters=4))
    # both formulations score the batch's probed-list UNION (superset
    # candidates): the packed device scan by design (ops/ivf_pack), the
    # tiered host scan since the per-query mask was dropped (it was a
    # 70 ms/block device gather that only ever removed candidates)
    dv, di = ivf.search_union(queries, top_k=10, nprobe=16)

    ivf.save(str(tmp_path / "ivf"))
    tiered = TieredIVF.load(str(tmp_path / "ivf"), block_rows=512)
    tv, ti = tiered.search(queries, top_k=10, nprobe=16)

    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(di, ti)
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(np.sort(dv, 1), np.sort(tv, 1), atol=0.3)

    # tiny-block edge: block smaller than the longest list still exact
    tiered_small = TieredIVF.load(str(tmp_path / "ivf"), block_rows=64)
    sv, si = tiered_small.search(queries, top_k=10, nprobe=16)
    np.testing.assert_allclose(np.sort(sv, 1), np.sort(tv, 1), atol=1e-4)


def test_tiered_ivf_mips_two_stage(tmp_path):
    """Full two-stage MIPS over a host-tier IVF must agree with the
    device-resident IVF (same lists probed, host rescore vs device)."""
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.index.tiered import TieredIVF

    store = _tiny_store(tmp_path, n_docs=20, seed=21)
    codes = np.asarray(store.vecs)
    ivf = IVFIndex.build(codes, IVFConfig(num_clusters=8, fine_quant="SQ8",
                                          kmeans_iters=4),
                         offset=store.offset, scale=store.scale)
    ivf.save(str(tmp_path / "ivf"))
    tiered = TieredIVF.load(str(tmp_path / "ivf"), block_rows=64)
    tiered.store_vecs = store.vecs

    mips_dev = MIPS(store, index=ivf)
    mips_host = MIPS(store, index=tiered)
    assert mips_host.tiered and mips_host.vecs_dev is None

    d = store.dim
    qvec = np.random.default_rng(22).normal(size=(3, 2 * d)).astype(np.float32)
    out_a = mips_dev.search(qvec, top_k=4, aggregate=False, nprobe=8)
    out_b = mips_host.search(qvec, top_k=4, aggregate=False, nprobe=8)
    for ra, rb in zip(out_a, out_b):
        # host rescore runs in f32 numpy, device in bf16 — near-ties on
        # random data reorder, so compare candidate overlap + scores
        ans_a = [(r["doc_idx"], r["start_pos"], r["end_pos"]) for r in ra]
        ans_b = [(r["doc_idx"], r["start_pos"], r["end_pos"]) for r in rb]
        assert len(set(ans_a) & set(ans_b)) >= max(1, len(ans_a) // 2)
        sa = sorted(r["score"] for r in ra)
        sb = sorted(r["score"] for r in rb)
        np.testing.assert_allclose(sa, sb, atol=0.35)

    # inverse-perm fallback (no store memmap attached) returns same rows
    tiered.store_vecs = None
    rows_inv = tiered.gather_rows_host(np.array([0, 5, 11]))
    np.testing.assert_array_equal(rows_inv, codes[[0, 5, 11]])


def test_tiered_mips_return_idxs_vectors(tmp_path):
    store = _tiny_store(tmp_path, seed=9)
    tiered_idx = TieredFlatIndex(
        np.asarray(store.vecs), store.offset, store.scale,
        hbm_budget_bytes=0, block_rows=16)
    mips = MIPS(store, index=tiered_idx)
    d = store.dim
    qvec = np.random.default_rng(5).normal(size=(2, 2 * d)).astype(np.float32)
    out = mips.search(qvec, top_k=3, aggregate=False, return_idxs=True)
    for ret in out:
        for r in ret:
            assert r["start_vec"] is not None and r["start_vec"].shape == (d,)
            assert np.isfinite(r["start_vec"]).all()


def test_tiered_vecs_on_device_matches_attached(tmp_path):
    """The host-tiered serve path must also support the query-FT
    vecs-on-device protocol: [B, 2K, D] arrays + cand_col gather must
    reproduce the vectors the return_idxs path attaches."""
    import jax.numpy as jnp

    store = _tiny_store(tmp_path)
    d = store.dim
    rng = np.random.default_rng(5)
    qvec = rng.normal(size=(2, 2 * d)).astype(np.float32)
    tiered_idx = TieredFlatIndex(
        np.asarray(store.vecs), store.offset, store.scale,
        hbm_budget_bytes=0, block_rows=16)
    mips = MIPS(store, index=tiered_idx)

    ref = mips.search(qvec, top_k=4, return_idxs=True)
    results, (sv, ev) = mips.search(qvec, top_k=4, vecs_on_device=True)
    assert sv.shape == (2, 8, d) and ev.shape == (2, 8, d)
    for bi in range(2):
        for r_ref, r_new in zip(ref[bi], results[bi]):
            col = r_new["cand_col"]
            np.testing.assert_allclose(np.asarray(sv[bi, col]),
                                       r_ref["start_vec"], atol=1e-5)
            np.testing.assert_allclose(np.asarray(ev[bi, col]),
                                       r_ref["end_vec"], atol=1e-5)


def test_build_host_save_matches_device_build(tmp_path):
    """The beyond-HBM host-save build must write a directory equivalent
    to the normal build's save(): same layout arrays, and both
    TieredIVF and IVFIndex serve it with the same results."""
    import numpy as np

    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.index.tiered import TieredIVF
    from densephrases_tpu.ops.quant import float_to_int8

    rng = np.random.default_rng(3)
    codes = float_to_int8(rng.normal(size=(2000, 64)).astype(np.float32)
                          * 0.4)
    cfg = IVFConfig(num_clusters=16, fine_quant="SQ8", kmeans_iters=4,
                    seed=5)
    dev_dir, host_dir = str(tmp_path / "dev"), str(tmp_path / "host")
    IVFIndex.build(codes, cfg).save(dev_dir)
    IVFIndex.build_host_save(codes, cfg, host_dir)
    for name in ("centroids", "row_perm", "list_offsets", "codes"):
        a = np.load(f"{dev_dir}/{name}.npy")
        b = np.load(f"{host_dir}/{name}.npy")
        np.testing.assert_array_equal(a, b)

    q = rng.normal(size=(4, 64)).astype(np.float32)
    v1, i1 = IVFIndex.load(host_dir).search(q, top_k=10, nprobe=16)
    v2, i2 = TieredIVF.load(host_dir).search(q, top_k=10, nprobe=16)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-3)
