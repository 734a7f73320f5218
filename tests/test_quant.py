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
