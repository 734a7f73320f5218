"""Exact-length packed IVF union scan (ops/ivf_pack) + IVF-SQ4 lists.

Correctness contract under test:
- with nprobe = nlist the packed scan equals a flat exact scan over the
  quantized codes (disjoint + complete block coverage),
- returned scores are EXACT quantized dot products for their ids,
- no id is ever returned twice for one query (boundary blocks are not
  double-covered),
- packed results dominate the grouped masked scan rank-for-rank (the
  packed candidate set is a superset of the masked per-query set),
- SQ4 (packed int4 lists; ref QT_4bit build_phrase_index.py:103-105)
  round-trips through build/save/load/search.

All run in Pallas interpret mode on the CPU test platform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
from densephrases_tpu.ops.ivf_pack import RB, pack_budget_table
from densephrases_tpu.ops.quant import (
    DEFAULT_OFFSET,
    DEFAULT_SCALE,
    INT4_OFFSET,
    INT4_SCALE,
    float_to_int8,
    int4_to_float,
)

N, D = 1500, 256
NLIST = 16


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, D)).astype(np.float32) * 0.4
    return float_to_int8(x)


def _queries(b=8, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, D)).astype(np.float32)


def _build(fine_quant="SQ8", seed=0):
    cfg = IVFConfig(num_clusters=NLIST, fine_quant=fine_quant,
                    kmeans_iters=4, seed=seed)
    return IVFIndex.build(_corpus(seed), cfg)


def _brute_scores(q, deq_bf16_source):
    """Matches the kernel arithmetic: bf16 operands, f32 accumulation."""
    qb = jnp.asarray(q, jnp.float32).astype(jnp.bfloat16)
    cb = jnp.asarray(deq_bf16_source).astype(jnp.bfloat16)
    return np.asarray(jax.lax.dot_general(
        qb, cb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))


def _brute_sq8(q, codes_int8):
    raw = _brute_scores(q, codes_int8)
    qsum = q.astype(np.float32).sum(-1) * DEFAULT_OFFSET
    return raw / DEFAULT_SCALE + qsum[:, None]


def test_full_probe_equals_flat_exact():
    idx = _build("SQ8")
    assert idx._packed_ok and idx.use_packed
    q = _queries()
    k = 25
    vals, gids = idx.search_union(q, top_k=k, nprobe=NLIST)
    brute = _brute_sq8(q, _corpus())
    want = np.sort(brute, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(vals, want, atol=1e-4, rtol=0)
    # each returned id's exact score equals the returned value
    got = np.take_along_axis(brute, gids.astype(np.int64), axis=1)
    np.testing.assert_allclose(vals, got, atol=1e-4, rtol=0)


def test_no_duplicate_ids_partial_probe():
    idx = _build("SQ8")
    q = _queries(b=16, seed=3)
    vals, gids = idx.search_union(q, top_k=40, nprobe=5)
    for r in range(q.shape[0]):
        real = gids[r][vals[r] > -1e29]
        assert len(np.unique(real)) == len(real)


def test_packed_dominates_grouped_scan():
    idx = _build("SQ8")
    q = _queries(b=8, seed=4)
    vp, _ = idx.search_union(q, top_k=20, nprobe=4)
    idx.use_packed = False
    vg, _ = idx.search_union(q, top_k=20, nprobe=4)
    # identical probes, superset candidate coverage: packed scores dominate
    assert np.all(vp >= vg - 1e-4)


def test_scores_exact_partial_probe():
    idx = _build("SQ8")
    q = _queries(b=4, seed=5)
    vals, gids = idx.search_union(q, top_k=30, nprobe=6)
    brute = _brute_sq8(q, _corpus())
    got = np.take_along_axis(brute, gids.astype(np.int64), axis=1)
    live = vals > -1e29
    np.testing.assert_allclose(vals[live], got[live], atol=1e-4, rtol=0)


def test_budget_table_is_upper_bound():
    idx = _build("SQ8")
    offs = np.asarray(idx.list_offsets)
    table = pack_budget_table(offs, idx.cap)
    lens = np.minimum(np.diff(offs), idx.cap)
    nblk = (offs[:-1] + lens + RB - 1) // RB - offs[:-1] // RB
    rng = np.random.default_rng(0)
    for u in (1, 3, NLIST):
        sel = rng.choice(NLIST, size=u, replace=False)
        assert nblk[sel].sum() <= table[u - 1]


def test_sq4_build_and_search():
    idx = _build("SQ4")
    assert idx.sq4 and idx.codes.shape[1] == D // 2
    q = _queries(b=6, seed=7)
    vals, gids = idx.search_union(q, top_k=20, nprobe=NLIST)
    # exact vs int4-dequantized brute force (same bf16/f32 arithmetic)
    packed = np.asarray(idx.codes[: idx.n_real]).view(np.uint8)
    order = np.asarray(idx.row_perm[: idx.n_real])
    inv = np.empty(N, np.int64)
    inv[order] = np.arange(N)
    nib = np.concatenate([packed >> 4, packed & 0xF], axis=1)[inv]
    # mirror the kernel arithmetic for the index's (trained per-dim)
    # contract: bf16 (q / scale) x raw nibbles, f32 accumulate, + q-dot-lo
    i4_off = np.asarray(idx.int4_offset, np.float32)
    i4_sc = np.asarray(idx.int4_scale, np.float32)
    q_sc = q.astype(np.float32) / i4_sc
    raw = _brute_scores(q_sc, nib)
    brute = raw + (q_sc * (i4_sc * i4_off)).sum(-1)[:, None]
    want = np.sort(brute, axis=1)[:, ::-1][:, :20]
    np.testing.assert_allclose(vals, want, atol=1e-3, rtol=0)
    got = np.take_along_axis(brute, gids.astype(np.int64), axis=1)
    np.testing.assert_allclose(vals, got, atol=1e-3, rtol=0)


def test_sq4_recall_vs_float_truth():
    idx = _build("SQ4")
    q = _queries(b=8, seed=8)
    k = 10
    _, gids = idx.search_union(q, top_k=k, nprobe=NLIST)
    # ground truth on int8-dequantized floats (the store's own contract)
    from densephrases_tpu.ops.quant import int8_to_float

    truth = q @ int8_to_float(_corpus()).T
    want = np.argsort(-truth, axis=1)[:, :k]
    rec = np.mean([len(set(gids[r]) & set(want[r])) / k
                   for r in range(q.shape[0])])
    # random gaussian data is the int4 worst case (quant step ~0.43 vs
    # data std 0.4); real phrase vectors fare far better
    assert rec >= 0.5, rec


def test_sq4_single_query_routes_packed():
    idx = _build("SQ4")
    q = _queries(b=1, seed=9)
    vals, gids = idx.search(q, top_k=5, nprobe=NLIST)
    assert vals.shape == (1, 5) and np.all(vals > -1e29)


def test_sq4_save_load_roundtrip(tmp_path):
    idx = _build("SQ4")
    q = _queries(b=4, seed=10)
    v0, g0 = idx.search_union(q, top_k=8, nprobe=6)
    idx.save(str(tmp_path / "ivf"))
    idx2 = IVFIndex.load(str(tmp_path / "ivf"))
    assert idx2.sq4 and idx2._packed_ok
    v1, g1 = idx2.search_union(q, top_k=8, nprobe=6)
    np.testing.assert_allclose(v0, v1, atol=1e-5)
    np.testing.assert_array_equal(g0, g1)


def test_grouped_sq4_fallback_matches_packed():
    idx = _build("SQ4")
    q = _queries(b=8, seed=11)
    vp, _ = idx.search_union(q, top_k=15, nprobe=NLIST)
    idx.use_packed = False
    vg, _ = idx.search_union(q, top_k=15, nprobe=NLIST)
    # full probe: identical candidate coverage → identical top-k scores
    np.testing.assert_allclose(vp, vg, atol=1e-3, rtol=0)


def test_top_k_larger_than_corpus_pads():
    codes = float_to_int8(
        np.random.default_rng(2).normal(size=(64, D)).astype(np.float32))
    cfg = IVFConfig(num_clusters=4, fine_quant="SQ8", kmeans_iters=2)
    idx = IVFIndex.build(codes, cfg)
    q = _queries(b=4, seed=12)
    vals, gids = idx.search_union(q, top_k=128, nprobe=4)
    assert vals.shape == (4, 128)
    assert np.all(np.isfinite(vals[:, :32]))

# ------------------------------------------------------- Pallas PQ scan

def _build_pq(seed=0, refine_factor=4, fine_quant="OPQ8"):
    cfg = IVFConfig(num_clusters=NLIST, fine_quant=fine_quant,
                    pq_iters=3, opq_iters=2, kmeans_iters=4, seed=seed,
                    refine_factor=refine_factor)
    return IVFIndex.build(_corpus(seed), cfg)


@pytest.mark.parametrize("batch,nprobe,fine_quant", [
    (1, 4, "OPQ8"), (8, 6, "OPQ8"), (8, NLIST, "OPQ8"),
    (1, 4, "OPQ32x4"), (8, NLIST, "OPQ32x4"),
])
def test_pq_pallas_matches_xla_block_scan(batch, nprobe, fine_quant):
    """The Pallas PQ LUT kernel must agree with the pure-XLA block scan
    (same probes, same union coverage, same residual + refine math) —
    for 8-bit books and for 4-bit nibble-packed books (the fast-scan
    operating point)."""
    idx = _build_pq(fine_quant=fine_quant)
    assert idx._pq_block_ok and idx._pq_pallas and idx.pq_residual
    q = _queries(b=batch, seed=7)
    vp, ip = idx.search_union(q, top_k=20, nprobe=nprobe)
    idx._pq_pallas = False
    vx, ix = idx.search_union(q, top_k=20, nprobe=nprobe)
    idx._pq_pallas = True
    np.testing.assert_allclose(vp, vx, atol=1e-3, rtol=0)
    assert (ip == ix).mean() > 0.95  # ties may swap order


def test_pq_pallas_full_probe_recall():
    """At nprobe = nlist with a deep int8 refine, the Pallas PQ path must
    agree with the exact int8 ranking on most of the top-k (M=16 keeps
    PQ distortion from dominating; rf16 widens stage-1)."""
    idx = _build_pq(refine_factor=16, fine_quant="OPQ16")
    q = _queries(b=8, seed=8)
    vals, gids = idx.search_union(q, top_k=10, nprobe=NLIST)
    brute = _brute_sq8(q, _corpus())
    exact = np.argsort(brute, axis=1)[:, ::-1][:, :10]
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(gids, exact)])
    assert overlap >= 0.9, overlap
    # refined scores are exact int8 scores of their ids
    got = np.take_along_axis(brute, gids.astype(np.int64), axis=1)
    live = vals > -1e29
    np.testing.assert_allclose(vals[live], got[live], atol=1e-3, rtol=0)


def test_pq_pallas_no_refine_path():
    idx = _build_pq(refine_factor=1)
    assert idx.refine_codes is None
    q = _queries(b=4, seed=9)
    vp, ip = idx.search_union(q, top_k=15, nprobe=6)
    idx._pq_pallas = False
    vx, ix = idx.search_union(q, top_k=15, nprobe=6)
    np.testing.assert_allclose(vp, vx, atol=1e-3, rtol=0)


def test_pq_host_refine_matches_device_refine():
    """refine_mode=host (memmap int8 on the host, numpy re-rank) must
    return the same ids as the device refine path — the PQ memory-point
    serve's recall claim rides on this equivalence."""
    idx = _build_pq(refine_factor=8, fine_quant="OPQ16")
    q = _queries(b=8, seed=13)
    vd, gd = idx.search_union(q, top_k=10, nprobe=8)
    # move the refine matrix to the host tier
    idx.refine_host = np.asarray(idx.refine_codes)
    idx.refine_codes = None
    vh, gh = idx.search_union(q, top_k=10, nprobe=8)
    assert (gd == gh).mean() > 0.95  # ties may swap order
    np.testing.assert_allclose(vd, vh, atol=0.2, rtol=0)  # bf16 vs f32


def test_pq_pallas_4bit_full_probe_recall():
    """4-bit books at the same total bits (OPQ64x4 = 256 bits = OPQ32):
    with a deep int8 refine the Pallas path must still recover most of
    the exact top-k at full probe."""
    idx = _build_pq(refine_factor=16, fine_quant="OPQ64x4")
    assert idx.codes.shape[1] == 32  # nibble-packed
    q = _queries(b=8, seed=8)
    vals, gids = idx.search_union(q, top_k=10, nprobe=NLIST)
    brute = _brute_sq8(q, _corpus())
    exact = np.argsort(brute, axis=1)[:, ::-1][:, :10]
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(gids, exact)])
    assert overlap >= 0.85, overlap
    got = np.take_along_axis(brute, gids.astype(np.int64), axis=1)
    live = vals > -1e29
    np.testing.assert_allclose(vals[live], got[live], atol=1e-3, rtol=0)
