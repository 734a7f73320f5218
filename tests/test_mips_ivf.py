"""MIPS two-stage search over an IVF index must agree with flat-index MIPS."""

import numpy as np
import pytest

from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.index.store import DocMeta, StoreWriter
from densephrases_tpu.ops.quant import float_to_int8, int8_to_float


def _store(tmp_path, n_docs=40, vecs_per_doc=50, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    writer = StoreWriter(str(tmp_path / "store"), dim)
    # clustered vectors (as real phrase embeddings are) so IVF probing works
    centers = rng.normal(-2, 1.0, (24, dim)).astype(np.float32)
    for d in range(n_docs):
        ci = rng.integers(0, 24, vecs_per_doc)
        vecs = (centers[ci] + 0.25 * rng.normal(size=(vecs_per_doc, dim))
                ).astype(np.float32)
        writer.add_doc(
            DocMeta(doc_id=d, title=f"doc{d}",
                    context=" ".join(["tok"] * (vecs_per_doc + 2)),
                    word2char_start=np.arange(vecs_per_doc, dtype=np.int32) * 4,
                    word2char_end=np.arange(vecs_per_doc, dtype=np.int32) * 4 + 3,
                    f2o_start=np.arange(vecs_per_doc, dtype=np.int32)),
            float_to_int8(vecs))
    return writer.finalize()


def _queries(store, n=8, seed=1):
    rng = np.random.default_rng(seed)
    qs = []
    for _ in range(n):
        dpos = int(rng.integers(0, store.num_docs))
        b0 = int(store.doc_bases[dpos])
        s = int(rng.integers(0, 40))
        qs.append(np.concatenate([
            int8_to_float(np.asarray(store.vecs[b0 + s])),
            int8_to_float(np.asarray(store.vecs[b0 + s + 2]))]))
    return np.stack(qs)


def _span_overlap(outs_a, outs_b, k=5):
    """Fraction of top-k spans of A that appear in top-k of B."""
    fr = []
    for ra, rb in zip(outs_a, outs_b):
        sa = {(r["doc_idx"], r["start_idx"], r["end_idx"]) for r in ra[:k]}
        sb = {(r["doc_idx"], r["start_idx"], r["end_idx"]) for r in rb[:k]}
        fr.append(len(sa & sb) / max(len(sa), 1))
    return float(np.mean(fr))


@pytest.mark.parametrize("fine_quant,nprobe,min_overlap", [
    ("SQ8", 32, 0.95),   # full probe, same quantization → near-identical
    ("SQ8", 12, 0.55),   # partial probe → most spans still found
    ("OPQ8", 16, 0.5),   # PQ stage-1 + int8 refine → majority agreement
    ("OPQ32x4", 16, 0.5),  # 4-bit nibble-packed stage-1 + int8 refine
])
def test_ivf_mips_matches_flat_mips(tmp_path, fine_quant, nprobe, min_overlap):
    store = _store(tmp_path)
    flat_mips = MIPS(store)
    ivf = IVFIndex.build(np.asarray(store.vecs),
                         IVFConfig(num_clusters=32, fine_quant=fine_quant,
                                   kmeans_iters=5, pq_iters=3, opq_iters=2))
    ivf_mips = MIPS(store, index=ivf)
    q = _queries(store)
    out_flat = flat_mips.search(q, top_k=5)
    out_ivf = ivf_mips.search(q, top_k=5, nprobe=nprobe)
    ov = _span_overlap(out_flat, out_ivf)
    assert ov >= min_overlap, f"{fine_quant} nprobe={nprobe}: overlap {ov}"
    # all results remain internally consistent
    for ret in out_ivf:
        for r in ret:
            assert r["answer"] == r["context"][r["start_pos"]:r["end_pos"]]


def test_mips_shares_opq_refine_matrix(tmp_path):
    """A PQ/OPQ index's int8 refine matrix is the original-order corpus;
    MIPS must reuse it for the rescore stage instead of uploading a
    second corpus copy (the 10M-scale HBM budget depends on this)."""
    import numpy as np

    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.index.search import MIPS

    store = _store(tmp_path)
    cfg = IVFConfig(num_clusters=8, fine_quant="OPQ32", kmeans_iters=2,
                    pq_iters=2, opq_iters=1)
    ivf = IVFIndex.build(np.asarray(store.vecs), cfg)
    assert ivf.refine_codes is not None
    mips = MIPS(store, index=ivf)
    assert mips.vecs_dev is ivf.refine_codes
    q = np.random.default_rng(0).normal(
        size=(2, 2 * store.dim)).astype(np.float32)
    outs = mips.search(q, top_k=3, nprobe=8, aggregate=True)
    assert len(outs) == 2 and outs[0]


def test_pack_budget_tiers_ladder():
    """Tier ladder: ascending, last tier is the (SMEM-clipped) worst
    case, and every tier is 64-block aligned."""
    import os

    import numpy as np

    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.ops.quant import float_to_int8

    rng = np.random.default_rng(0)
    codes = float_to_int8(rng.normal(size=(4000, 128)).astype(np.float32) * 0.4)
    idx = IVFIndex.build(codes, IVFConfig(num_clusters=16, fine_quant="SQ8",
                                          kmeans_iters=2))
    for b, nprobe in ((1, 4), (8, 16), (64, 16)):
        tiers = idx._pack_budgets(b, nprobe)
        assert all(t % 64 == 0 for t in tiers), tiers
        assert list(tiers) == sorted(set(tiers)), tiers
        u = min(b * nprobe, int(idx.centroids.shape[0]))
        worst = int(idx._pack_table[u - 1])
        smem = int(os.environ.get("DPH_PACK_SMEM_BLOCKS", 160 * 1024))
        assert tiers[-1] >= min(worst, smem), (tiers, worst)


@pytest.mark.parametrize("fine_quant", ["OPQ16", "OPQ32x4"])
def test_mips_pq_decode_serve_no_int8(tmp_path, fine_quant):
    """Reconstruct-from-codes serving (ref faiss reconstruct(), ref
    index.py:275-302): with no refine matrix, MIPS must serve a PQ index
    with NO original-order int8 corpus on device — stage 2 decodes
    candidate windows from the residual codes — and still mostly agree
    with the full int8 serve."""
    store = _store(tmp_path)
    flat_mips = MIPS(store)
    ivf = IVFIndex.build(np.asarray(store.vecs),
                         IVFConfig(num_clusters=32, fine_quant=fine_quant,
                                   kmeans_iters=5, pq_iters=3, opq_iters=2,
                                   refine_factor=1))
    assert ivf.refine_codes is None
    mips = MIPS(store, index=ivf)
    assert mips.pq_serve is not None and mips.vecs_dev is None
    q = _queries(store)
    out_pq = mips.search(q, top_k=5, nprobe=32)
    out_flat = flat_mips.search(q, top_k=5)
    ov = _span_overlap(out_flat, out_pq)
    assert ov >= 0.5, ov
    for ret in out_pq:
        for r in ret:
            assert r["answer"] == r["context"][r["start_pos"]:r["end_pos"]]


def test_mips_pq_decode_return_vecs_score_consistency(tmp_path):
    """In decode mode with return_idxs, handed-out vectors must satisfy
    q · v == serve score (the query-FT contract, ref index.py:380-389)."""
    store = _store(tmp_path)
    ivf = IVFIndex.build(np.asarray(store.vecs),
                         IVFConfig(num_clusters=32, fine_quant="OPQ16",
                                   kmeans_iters=5, pq_iters=3, opq_iters=2,
                                   refine_factor=1))
    mips = MIPS(store, index=ivf)
    q = _queries(store, n=4)
    outs = mips.search(q, top_k=4, nprobe=32, return_idxs=True)
    d = store.dim
    for b, ret in enumerate(outs):
        for r in ret[:3]:
            got = float(q[b, :d] @ r["start_vec"] + q[b, d:] @ r["end_vec"])
            assert abs(got - r["score"]) < 0.75, (got, r["score"])
