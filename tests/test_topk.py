import jax.numpy as jnp
import numpy as np

from densephrases_tpu.ops import topk, topk_merge


def test_topk_basic():
    scores = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    vals, idx = topk(scores, 2)
    np.testing.assert_array_equal(np.asarray(vals), [[5.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(idx), [[1, 2]])


def test_topk_merge_matches_global_sort():
    rng = np.random.default_rng(0)
    n_shards, k = 4, 8
    scores = rng.normal(size=(2, n_shards, k)).astype(np.float32)
    ids = rng.integers(0, 10**9, size=(2, n_shards, k)).astype(np.int64)
    vals, out_ids = topk_merge(jnp.asarray(scores), jnp.asarray(ids), k)
    for b in range(2):
        flat = scores[b].reshape(-1)
        order = np.argsort(-flat)[:k]
        np.testing.assert_allclose(np.asarray(vals[b]), flat[order], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out_ids[b]), ids[b].reshape(-1)[order]
        )
