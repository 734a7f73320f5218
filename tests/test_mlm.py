"""MLM pretraining stage (train/mlm.py) + offline corpus harvest.

The pretraining stage is the offline substitute for the reference's
hub-downloaded SpanBERT initialization (ref: encoder.py:20-52,
single_utils.py:59-118): these tests pin the corruption distribution,
that the one-jit step optimizes, that the head's tied decoder actually
learns the data distribution, and that the backbone transplants into
DensePhrases tower params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.preprocess.offline_corpus import looks_like_prose
from densephrases_tpu.train.mlm import (
    MASK_RATE,
    N_SPECIAL,
    encoder_params_from_backbone,
    init_mlm_params,
    make_mlm_optimizer,
    make_mlm_step,
    mlm_loss,
    pack_chunks,
    pretrain_mlm,
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "A phrase retrieval system returns short answers from a large corpus.",
    "Dense vector indexes trade exactness for speed through quantization.",
    "Training a language model requires predicting masked tokens in text.",
] * 8


@pytest.fixture(scope="module")
def tok():
    return train_wordpiece_vocab(TEXTS, vocab_size=300)


@pytest.fixture(scope="module")
def config(tok):
    return BertConfig.tiny(vocab_size=tok.vocab_size)


def test_pack_chunks_shapes(tok):
    chunks = pack_chunks(TEXTS, tok, seq_len=32)
    assert chunks.ndim == 2 and chunks.shape[1] == 32
    assert (chunks[:, 0] == tok.cls_token_id).all()
    # every row ends its real content with [SEP]; pads only after
    for row in chunks:
        nz = row != tok.pad_token_id
        last = np.nonzero(nz)[0][-1]
        assert row[last] == tok.sep_token_id
        assert not nz[last + 1:].any()


def test_corruption_distribution(tok, config):
    """~15% of maskable tokens predicted; 80/10/10 mask/random/keep."""
    params = init_mlm_params(jax.random.PRNGKey(0), config)
    chunks = pack_chunks(TEXTS * 40, tok, seq_len=64)
    ids = jnp.asarray(chunks)
    am = (ids != tok.pad_token_id).astype(jnp.int32)

    # reproduce the corruption arithmetic exactly as mlm_loss does
    rng = jax.random.key(3, impl="threefry2x32")
    r_pos, r_act, r_tok, _ = jax.random.split(rng, 4)
    maskable = np.asarray((am > 0) & (ids >= N_SPECIAL))
    u_pos = np.asarray(jax.random.bits(r_pos, ids.shape, dtype=jnp.uint8))
    is_pred = maskable & (u_pos < int(round(MASK_RATE * 256)))
    frac = is_pred.sum() / maskable.sum()
    assert 0.12 < frac < 0.18, frac
    u_act = np.asarray(jax.random.bits(r_act, ids.shape, dtype=jnp.uint8))
    sel = u_act[is_pred]
    m = (sel < 204).mean()
    r = ((sel >= 204) & (sel < 230)).mean()
    assert 0.75 < m < 0.85 and 0.06 < r < 0.14, (m, r)


def test_mlm_loss_finite_and_mask_only(tok, config):
    params = init_mlm_params(jax.random.PRNGKey(0), config)
    chunks = pack_chunks(TEXTS, tok, seq_len=32)
    ids = jnp.asarray(chunks[:4])
    am = (ids != tok.pad_token_id).astype(jnp.int32)
    loss, metrics = mlm_loss(params, config, ids, am,
                             jax.random.key(0, impl="threefry2x32"),
                             mask_token_id=tok.mask_token_id,
                             deterministic=True)
    assert np.isfinite(float(loss))
    # roughly ln(V) at random init
    assert 1.0 < float(loss) < 2 * np.log(config.vocab_size)
    assert 0 < float(metrics["n_pred"]) < float(am.sum())


def test_mlm_step_learns(tok, config):
    """Loss on repeated tiny data must drop sharply within a few steps."""
    params = init_mlm_params(jax.random.PRNGKey(0), config)
    opt = make_mlm_optimizer(1e-2, warmup_steps=5, total_steps=150)
    opt_state = opt.init(params)
    step = make_mlm_step(config, opt, mask_token_id=tok.mask_token_id,
                         remat="none")
    chunks = pack_chunks(TEXTS, tok, seq_len=32)
    ids = jnp.asarray(chunks[:8])
    batch = {"input_ids": ids,
             "attention_mask": (ids != tok.pad_token_id).astype(jnp.int32)}
    rng = jax.random.key(1, impl="threefry2x32")
    losses = []
    for _ in range(150):
        rng, sub = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:5]), (
        losses[:5], losses[-10:])


def test_pretrain_and_transplant(tok, config):
    params, history = pretrain_mlm(
        TEXTS, tok, config, steps=12, batch_size=4, seq_len=32, lr=3e-3,
        seed=0, log_every=4, rng_impl="threefry", holdout_frac=0.1)
    assert len(history["loss"]) >= 2
    enc = encoder_params_from_backbone(params["bert"], config)
    for tower in ("phrase", "query_start", "query_end"):
        np.testing.assert_array_equal(
            np.asarray(enc[tower]["embed"]["word"]),
            np.asarray(params["bert"]["embed"]["word"]))
    assert enc["filter"]["w"].shape == (config.hidden_size, 2)
    # transplanted params drive the RC loss machinery
    from densephrases_tpu.models.encoder import RCLossConfig, rc_loss

    b, l = 2, 32
    batch = {
        "input_ids": jnp.asarray(pack_chunks(TEXTS, tok, 32)[:b]),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "token_type_ids": jnp.zeros((b, l), jnp.int32),
        "query_input_ids": jnp.asarray(pack_chunks(TEXTS, tok, 32)[:b]),
        "query_attention_mask": jnp.ones((b, l), jnp.int32),
        "start_positions": jnp.asarray([1, 2]),
        "end_positions": jnp.asarray([2, 3]),
        "is_impossible": jnp.zeros((b,), jnp.float32),
    }
    loss, _ = rc_loss(enc, config, batch, RCLossConfig())
    assert np.isfinite(float(loss))


def test_looks_like_prose_filter():
    assert looks_like_prose(
        "The system retrieves phrases from a corpus of documents. Each "
        "phrase is scored by an inner product against the query vector. "
        "The highest scoring phrases are returned to the user.")
    assert not looks_like_prose("def f(x):\n    return {x: 1}")
    assert not looks_like_prose("short text.")
    assert not looks_like_prose(
        "x = 1 | y = {2} | z -> [3] :: a = b == c != d >> e << f && g "
        "|| h ^ i ~ j % k $ l # m @ n & o * p + q - r / s \\ t")
