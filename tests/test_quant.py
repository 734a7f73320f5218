"""Quantization round-trip tests (parity with ref embed_utils.py:141-165)."""

import jax.numpy as jnp
import numpy as np

from densephrases_tpu.ops import (
    float_to_int8,
    int8_to_float,
    float_to_int4,
    int4_to_float,
    DEFAULT_OFFSET,
    DEFAULT_SCALE,
)


def test_int8_round_trip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(loc=-2.0, scale=1.5, size=(64, 768)).astype(np.float32)
    code = float_to_int8(x)
    back = int8_to_float(code)
    # In-range values must round-trip within half a quantization step.
    in_range = (x > DEFAULT_OFFSET - 128 / DEFAULT_SCALE) & (
        x < DEFAULT_OFFSET + 127 / DEFAULT_SCALE
    )
    err = np.abs(back - x)
    assert err[np.asarray(in_range)].max() <= 0.5 / DEFAULT_SCALE + 1e-6


def test_int8_matches_reference_semantics():
    # Reference: out = round(clip((x - offset) * scale, -128, 127)).astype(int8)
    x = np.array([[-2.0, 0.0, 4.35, -8.4, 1.234]], dtype=np.float32)
    code = float_to_int8(x, offset=-2.0, scale=20.0)
    expected = np.round(np.clip((x + 2.0) * 20.0, -128, 127)).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(code), expected)


def test_int8_jax_and_numpy_agree():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 768)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(float_to_int8(jnp.asarray(x))), float_to_int8(x)
    )
    code = float_to_int8(x)
    np.testing.assert_allclose(
        np.asarray(int8_to_float(jnp.asarray(code))), int8_to_float(code),
        rtol=1e-5, atol=1e-6,
    )


def test_int4_round_trip():
    rng = np.random.default_rng(2)
    x = rng.uniform(-3.4, 2.9, size=(8, 768)).astype(np.float32)
    packed = float_to_int4(x)
    assert packed.shape == (8, 384) and packed.dtype == np.uint8
    back = int4_to_float(packed)
    assert back.shape == x.shape
    # Max error = half a step of the coarse int4 grid.
    assert np.abs(back - x).max() <= 0.5 / 2.3 + 1e-6


def test_train_int4_ranges_improves_recall():
    """Trained per-dim ranges must beat the fixed global affine on
    clustered data whose range mismatches the legacy contract."""
    import numpy as np

    from densephrases_tpu.ops.quant import (
        INT4_OFFSET,
        INT4_SCALE,
        train_int4_ranges,
    )

    rng = np.random.default_rng(0)
    centers = rng.normal(-2, 1, (64, 64)).astype(np.float32)
    x = (centers[rng.integers(0, 64, 8000)]
         + 0.3 * rng.normal(size=(8000, 64))).astype(np.float32)
    q = x[:16] + 0.05 * rng.normal(size=(16, 64)).astype(np.float32)
    truth = np.argsort(-(q @ x.T), axis=1)[:, :20]

    def recall(lo, sc):
        c = np.clip(np.round((x - lo) * sc), 0, 15)
        xr = c / sc + lo
        ids = np.argsort(-(q @ xr.T), axis=1)[:, :20]
        return np.mean([len(set(a) & set(b)) / 20
                        for a, b in zip(ids, truth)])

    lo, sc = train_int4_ranges(x)
    assert lo.shape == (64,) and sc.shape == (64,)
    r_fixed = recall(np.float32(INT4_OFFSET), np.float32(INT4_SCALE))
    r_train = recall(lo, sc)
    assert r_train > r_fixed + 0.05, (r_fixed, r_train)


def test_sq4_trained_vs_legacy_contract_recall():
    """End-to-end: an SQ4 index built with trained ranges must beat the
    legacy fixed contract on recall vs the int8 ground truth."""
    import numpy as np

    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
    from densephrases_tpu.ops.quant import float_to_int8, int8_to_float

    rng = np.random.default_rng(3)
    centers = rng.normal(-2, 1, (32, 128)).astype(np.float32)
    x = (centers[rng.integers(0, 32, 4000)]
         + 0.3 * rng.normal(size=(4000, 128))).astype(np.float32)
    codes = float_to_int8(x)
    q = int8_to_float(codes[:8]) + 0.02 * rng.normal(
        size=(8, 128)).astype(np.float32)
    truth = np.argsort(-(q @ int8_to_float(codes).T), axis=1)[:, :10]

    def recall(idx):
        _, ids = idx.search_union(q, top_k=10, nprobe=8)
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(ids, truth)])

    cfg_t = IVFConfig(num_clusters=8, fine_quant="SQ4", kmeans_iters=3)
    cfg_l = IVFConfig(num_clusters=8, fine_quant="SQ4", kmeans_iters=3,
                      sq4_train_ranges=False)
    r_train = recall(IVFIndex.build(codes, cfg_t))
    r_legacy = recall(IVFIndex.build(codes, cfg_l))
    assert r_train >= r_legacy, (r_legacy, r_train)
    assert r_train > 0.55, r_train
