"""Pallas fused MIPS scan kernel vs reference scan (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from densephrases_tpu.ops.flat_scan_pallas import flat_scan_topk
from densephrases_tpu.ops.quant import float_to_int8, int8_to_float


def test_pallas_scan_matches_brute_force():
    rng = np.random.default_rng(0)
    n, d, b, k = 1024, 128, 8, 7
    codes = float_to_int8(rng.normal(-2, 1, (n, d)).astype(np.float32))
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vals, ids = flat_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), n, -2.0, 20.0,
        top_k=k, chunk=256, interpret=True)
    ref = queries @ int8_to_float(codes).T
    ref_ids = np.argsort(-ref, axis=1)[:, :k]
    ref_vals = np.take_along_axis(ref, ref_ids, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=0.2)
    agree = (np.asarray(ids) == ref_ids).mean()
    assert agree > 0.9, agree


def test_pallas_scan_masks_padding():
    rng = np.random.default_rng(1)
    n_real, pad_to, d, b = 100, 512, 128, 2
    codes = np.zeros((pad_to, d), np.int8)
    codes[:n_real] = float_to_int8(
        rng.normal(-2, 1, (n_real, d)).astype(np.float32))
    # padding rows would otherwise score offset*sum(q) — must be masked
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vals, ids = flat_scan_topk(
        jnp.asarray(queries), jnp.asarray(codes), n_real, -2.0, 20.0,
        top_k=5, chunk=128, interpret=True)
    assert (np.asarray(ids) < n_real).all()


def test_flat_index_pallas_backend_matches_xla():
    from densephrases_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(2)
    codes = float_to_int8(rng.normal(-2, 1, (2000, 128)).astype(np.float32))
    queries = rng.normal(size=(4, 128)).astype(np.float32)
    xla = FlatIndex(codes, chunk=512, backend="xla")
    pls = FlatIndex(codes, chunk=512, backend="pallas")
    v1, i1 = xla.search(queries, top_k=9)
    v2, i2 = pls.search(queries, top_k=9)
    assert (i1 == i2).mean() > 0.9
    np.testing.assert_allclose(v1, v2, atol=0.1)


# ------------------------------------------------ two-phase (selection-free)
def test_two_phase_scan_exact_when_m_covers_all():
    from densephrases_tpu.ops.flat_scan_pallas import flat_scan_topk2

    rng = np.random.default_rng(3)
    n, d, b, k = 1024, 128, 8, 7
    codes = float_to_int8(rng.normal(-2, 1, (n, d)).astype(np.float32))
    queries = rng.normal(size=(b, d)).astype(np.float32)
    # m_factor*k >= nsub_total -> every subtile rescored -> always exact
    vals, ids, ok = flat_scan_topk2(
        jnp.asarray(queries), jnp.asarray(codes), n, -2.0, 20.0,
        top_k=k, chunk=256, sub=128, m_factor=4, interpret=True)
    assert np.asarray(ok).all()
    ref = queries @ int8_to_float(codes).T
    ref_ids = np.argsort(-ref, axis=1)[:, :k]
    ref_vals = np.take_along_axis(ref, ref_ids, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=0.2)
    assert (np.asarray(ids) == ref_ids).mean() > 0.9


def test_two_phase_scan_ok_flag_certifies_exactness():
    from densephrases_tpu.ops.flat_scan_pallas import flat_scan_topk2

    rng = np.random.default_rng(4)
    n, d, b, k = 2048, 64, 16, 3
    codes = float_to_int8(rng.normal(-2, 1, (n, d)).astype(np.float32))
    queries = rng.normal(size=(b, d)).astype(np.float32)
    # m_factor=1 -> m=3 of 16 subtiles: some queries may be inexact, but
    # whenever ok=True the result must equal brute force
    vals, ids, ok = flat_scan_topk2(
        jnp.asarray(queries), jnp.asarray(codes), n, -2.0, 20.0,
        top_k=k, chunk=512, sub=128, m_factor=1, interpret=True)
    ref = queries @ int8_to_float(codes).T
    ref_ids = np.argsort(-ref, axis=1)[:, :k]
    ok = np.asarray(ok)
    assert ok.any(), "certificate never fired on gaussian data"
    for bi in np.nonzero(ok)[0]:
        assert set(np.asarray(ids)[bi].tolist()) == set(ref_ids[bi].tolist())


def test_two_phase_scan_masks_padding():
    from densephrases_tpu.ops.flat_scan_pallas import flat_scan_topk2

    rng = np.random.default_rng(5)
    n_real, pad_to, d, b = 100, 512, 128, 2
    codes = np.zeros((pad_to, d), np.int8)
    codes[:n_real] = float_to_int8(
        rng.normal(-2, 1, (n_real, d)).astype(np.float32))
    queries = rng.normal(size=(b, d)).astype(np.float32)
    vals, ids, ok = flat_scan_topk2(
        jnp.asarray(queries), jnp.asarray(codes), n_real, -2.0, 20.0,
        top_k=5, chunk=128, sub=128, m_factor=4, interpret=True)
    assert (np.asarray(ids) < n_real).all()
