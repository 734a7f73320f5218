import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densephrases_tpu.models.attention import attention_pallas, attention_xla
from densephrases_tpu.models.bert import BertConfig, bert_forward, init_bert_params
from densephrases_tpu.models.encoder import (
    RCLossConfig,
    embed_phrase,
    embed_query,
    init_encoder_params,
    init_pre_batch,
    pre_batch_update,
    query_loss,
    rc_loss,
)


@pytest.fixture(scope="module")
def cfg():
    return BertConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_bert_params(jax.random.PRNGKey(0), cfg)


def test_bert_forward_shape_and_mask_invariance(cfg, params):
    b, l = 2, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[:, 12:] = 0
    out = bert_forward(params, jnp.asarray(ids), jnp.asarray(mask),
                       config=cfg, attn_impl="xla", compute_dtype=jnp.float32)
    assert out.shape == (b, l, cfg.hidden_size)
    # Changing ids under the padding mask must not change unmasked outputs.
    ids2 = ids.copy()
    ids2[:, 12:] = (ids2[:, 12:] + 7) % cfg.vocab_size
    out2 = bert_forward(params, jnp.asarray(ids2), jnp.asarray(mask),
                        config=cfg, attn_impl="xla", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out[:, :12]), np.asarray(out2[:, :12]),
                               atol=1e-5)


def test_pallas_attention_matches_xla(cfg):
    # Pallas kernel in interpreter mode (CPU) must match the XLA formulation.
    rng = jax.random.PRNGKey(1)
    b, h, l, d = 2, 4, 16, 64
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (b, h, l, d))
               for i in range(3))
    mask = jnp.ones((b, l)).at[:, 12:].set(0)
    ref = attention_xla(q, k, v, mask)
    out = attention_pallas(q, k, v, mask, interpret=True)
    # This backend emulates TPU MXU bf16 matmul precision, so the two
    # formulations agree only to bf16 accumulation tolerance.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.99999


def test_pallas_attention_backward_matches_xla_vjp(cfg):
    # Fused Pallas backward (interpret mode) vs jax.vjp of the XLA
    # formulation: same gradients for q, k, v.
    from densephrases_tpu.models.attention import attention_vjp_pallas

    rng = jax.random.PRNGKey(2)
    b, h, l, d = 2, 3, 16, 64
    q, k, v, g = (jax.random.normal(jax.random.fold_in(rng, i), (b, h, l, d))
                  for i in range(4))
    mask = jnp.ones((b, l)).at[:, 11:].set(0)
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, mask),
                     q, k, v)
    rq, rk, rv = vjp(g)
    dq, dk, dv = attention_vjp_pallas(q, k, v, mask, g, interpret=True)
    for got, ref in ((dq, rq), (dk, rk), (dv, rv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2)
        corr = np.corrcoef(np.asarray(got).ravel(),
                           np.asarray(ref).ravel())[0, 1]
        assert corr > 0.9999


def test_embed_phrase_query_shapes(cfg):
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    b, l, lq = 2, 16, 8
    ids = jnp.zeros((b, l), jnp.int32)
    m = jnp.ones((b, l), jnp.int32)
    start, end, fs, fe = embed_phrase(params, cfg, ids, m, attn_impl="xla")
    assert start.shape == (b, l, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(start), np.asarray(end))
    assert fs.shape == (b, l) and fe.shape == (b, l)
    qs, qe = embed_query(params, cfg, jnp.zeros((b, lq), jnp.int32),
                         jnp.ones((b, lq), jnp.int32), attn_impl="xla")
    assert qs.shape == (b, cfg.hidden_size)
    # query towers start as copies of the phrase tower but are distinct trees
    assert params["query_start"] is not params["query_end"]


def _make_batch(cfg, b=4, l=24, lq=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, l)), jnp.int32),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "query_input_ids": jnp.asarray(rng.integers(5, cfg.vocab_size, (b, lq)), jnp.int32),
        "query_attention_mask": jnp.ones((b, lq), jnp.int32),
        "start_positions": jnp.asarray(rng.integers(1, l - 1, (b,)), jnp.int32),
        "end_positions": jnp.asarray(rng.integers(1, l - 1, (b,)), jnp.int32),
    }


def test_rc_loss_runs_and_differentiable(cfg):
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg)
    loss_cfg = RCLossConfig(lambda_neg=1.0, lambda_flt=1.0)
    pb = init_pre_batch(2, 4, cfg.hidden_size)

    def loss_fn(p):
        total, aux = rc_loss(p, cfg, batch, loss_cfg, pre_batch=pb,
                             deterministic=True, attn_impl="xla")
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert gnorm > 0


def test_single_loss_equals_ce_on_logits(cfg):
    """The reference's CE(dense_logits.mean(2)) must equal CE(start_logits):
    verify the claimed mathematical identity numerically."""
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg)
    total, aux = rc_loss(params, cfg, batch, RCLossConfig(), deterministic=True,
                         attn_impl="xla")
    s = np.asarray(aux["start_logits"], np.float64)
    e = np.asarray(aux["end_logits"], np.float64)
    dense = s[:, :, None] + e[:, None, :]  # ref: encoder.py:206-209

    def ce(logits, labels):
        logits = logits - logits.max(-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        return -np.mean([logp[i, labels[i]] for i in range(len(labels))])

    sp = np.asarray(batch["start_positions"])
    ep = np.asarray(batch["end_positions"])
    ref_loss = 0.5 * (ce(dense.mean(2), sp) + ce(dense.mean(1), ep))
    np.testing.assert_allclose(float(aux["single_loss"]), ref_loss, rtol=1e-4)


def test_pre_batch_ring_buffer(cfg):
    pb = init_pre_batch(3, 2, 4)
    g1 = jnp.ones((2, 4))
    pb = pre_batch_update(pb, g1, g1)
    assert int(pb["count"]) == 1
    np.testing.assert_array_equal(np.asarray(pb["start"][0]), np.ones((2, 4)))
    for _ in range(4):
        pb = pre_batch_update(pb, g1 * 2, g1 * 2)
    assert int(pb["count"]) == 5  # wrapped around


def test_query_loss(cfg):
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    b, c, h, lq = 2, 6, cfg.hidden_size, 8
    rng = np.random.default_rng(0)
    sv = jnp.asarray(rng.normal(size=(b, c, h)), jnp.float32)
    ev = jnp.asarray(rng.normal(size=(b, c, h)), jnp.float32)
    targets = jnp.zeros((b, c), bool).at[0, 1].set(True).at[1, 3].set(True)
    p_targets = jnp.zeros((b, c), bool).at[0, 2].set(True)
    loss, top1 = query_loss(
        params, cfg,
        jnp.zeros((b, lq), jnp.int32), jnp.ones((b, lq), jnp.int32),
        sv, ev, targets, p_targets, deterministic=True, attn_impl="xla")
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert top1.shape == (b,)


def test_rc_loss_with_hard_negatives(cfg):
    """Hard-negative passages add columns to the in-batch CE
    (ref: encoder.py:212-218,251-253)."""
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg)
    b, l = 4, 24
    rng = np.random.default_rng(7)
    batch["neg_input_ids"] = jnp.asarray(
        rng.integers(5, cfg.vocab_size, (b, l)), jnp.int32)
    batch["neg_attention_mask"] = jnp.ones((b, l), jnp.int32)
    loss_cfg = RCLossConfig(lambda_neg=1.0)
    total, aux = rc_loss(params, cfg, batch, loss_cfg, deterministic=True,
                         attn_impl="xla")
    assert np.isfinite(float(total))
    assert np.isfinite(float(aux["neg_loss"]))
    # negatives must increase (or equal) the neg CE vs no-negatives
    del batch["neg_input_ids"], batch["neg_attention_mask"]
    total2, aux2 = rc_loss(params, cfg, batch, loss_cfg, deterministic=True,
                           attn_impl="xla")
    assert float(aux["neg_loss"]) >= float(aux2["neg_loss"]) - 1e-4


def test_rc_loss_with_kl_distillation(cfg):
    """KL teacher loss path (ref: encoder.py:280-321) via precomputed
    cross inputs + teacher_gather map."""
    params = init_encoder_params(jax.random.PRNGKey(0), cfg,
                                 with_teacher=True)
    batch = _make_batch(cfg)
    b, l, lq = 4, 24, 8
    lc = l + lq
    rng = np.random.default_rng(8)
    batch["cross_input_ids"] = jnp.asarray(
        rng.integers(5, cfg.vocab_size, (b, lc)), jnp.int32)
    batch["cross_attention_mask"] = jnp.ones((b, lc), jnp.int32)
    batch["cross_token_type_ids"] = jnp.zeros((b, lc), jnp.int32)
    gather = np.full((b, l), -1, np.int32)
    gather[:, 1:] = np.arange(lq, lq + l - 1)[None, :]
    batch["teacher_gather"] = jnp.asarray(gather)
    loss_cfg = RCLossConfig(lambda_kl=2.0)
    total, aux = rc_loss(params, cfg, batch, loss_cfg, deterministic=True,
                         attn_impl="xla")
    assert np.isfinite(float(total))
    assert "kl_loss" in aux and float(aux["kl_loss"]) >= 0


def test_gelu_tanh_config_close_to_exact(cfg, params):
    """hidden_act="gelu_tanh" (the TPU training default, TrainOptions)
    must stay numerically close to the exact-erf HF-parity activation."""
    import dataclasses

    b, l = 2, 16
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), jnp.int32)
    out_erf = bert_forward(params, ids, mask, config=cfg, attn_impl="xla",
                           compute_dtype=jnp.float32)
    cfg_t = dataclasses.replace(cfg, hidden_act="gelu_tanh")
    out_tanh = bert_forward(params, ids, mask, config=cfg_t, attn_impl="xla",
                            compute_dtype=jnp.float32)
    diff = float(jnp.max(jnp.abs(out_erf - out_tanh)))
    assert 0 < diff < 5e-2, diff  # different path, small divergence


def test_dropout_rbg_key_stream(cfg, params):
    """Typed rbg dropout keys (TrainOptions.rng_impl) must drive distinct
    dropout masks per key and keep the deterministic path unchanged."""
    b, l = 2, 16
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), jnp.int32)
    k0 = jax.random.key(0, impl="rbg")
    out_a = bert_forward(params, ids, mask, config=cfg, attn_impl="xla",
                         compute_dtype=jnp.float32, deterministic=False,
                         dropout_rng=k0)
    out_b = bert_forward(params, ids, mask, config=cfg, attn_impl="xla",
                         compute_dtype=jnp.float32, deterministic=False,
                         dropout_rng=jax.random.fold_in(k0, 1))
    assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-6
    det1 = bert_forward(params, ids, mask, config=cfg, attn_impl="xla",
                        compute_dtype=jnp.float32)
    det2 = bert_forward(params, ids, mask, config=cfg, attn_impl="xla",
                        compute_dtype=jnp.float32, dropout_rng=k0)
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det2), atol=0)
