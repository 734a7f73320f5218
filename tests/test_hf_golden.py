"""Golden numerical parity vs HuggingFace BERT and the reference loss math.

The reference's published EM numbers ride on HF BertModel exactness
(ref: densephrases/encoder.py:20-52 builds towers from HF checkpoints via
single_utils.py:59-118). These tests prove that weights imported through
``models/hf_import.py`` produce the *same activations* as HF's torch
implementation, and that ``rc_loss``'s algebraic shortcuts (e.g. CE on
start_logits instead of CE on dense_logits.mean) match the literal
formulas the reference computes (ref: encoder.py:206-209,262-355).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from densephrases_tpu.models.bert import BertConfig, bert_forward
from densephrases_tpu.models.encoder import (
    RCLossConfig,
    embed_phrase,
    embed_query,
    init_encoder_params,
    rc_loss,
)
from densephrases_tpu.models.hf_import import bert_params_from_state_dict

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only


def _hf_pair(seed=0, layers=3, hidden=64, heads=4, ffn=128, vocab=211,
             max_pos=96, types=2):
    """Random-init HF BertModel + our matching config/params."""
    torch.manual_seed(seed)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=ffn,
        max_position_embeddings=max_pos, type_vocab_size=types,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", layer_norm_eps=1e-12,
    )
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=ffn,
        max_position_embeddings=max_pos, type_vocab_size=types,
    )
    params = bert_params_from_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


CASES = [
    # (batch, seq_len, n_pad_tail, use_token_types)
    (2, 16, 0, False),
    (3, 32, 7, True),
    (1, 96, 40, True),   # full max_position_embeddings length
    (4, 8, 3, False),
]


@pytest.mark.parametrize("b,l,pad,tt", CASES)
def test_bert_forward_matches_hf_activations(b, l, pad, tt):
    hf, cfg, params = _hf_pair()
    rng = np.random.default_rng(b * 1000 + l)
    input_ids = rng.integers(1, cfg.vocab_size, (b, l)).astype(np.int64)
    attention_mask = np.ones((b, l), np.int64)
    if pad:
        attention_mask[:, l - pad:] = 0
        input_ids[:, l - pad:] = 0
    token_type_ids = (
        rng.integers(0, cfg.type_vocab_size, (b, l)).astype(np.int64)
        if tt else np.zeros((b, l), np.int64))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
        ).last_hidden_state.numpy()

    with jax.default_matmul_precision("highest"):
        out = bert_forward(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(attention_mask, jnp.int32),
            jnp.asarray(token_type_ids, jnp.int32),
            config=cfg, deterministic=True, attn_impl="xla",
            compute_dtype=jnp.float32,
        )
    out = np.asarray(out)
    valid = attention_mask.astype(bool)
    # Valid positions must match tightly; padded query rows see the same
    # masked softmax in both implementations but HF uses a finite -inf
    # surrogate, so hold them to a looser bound.
    diff_valid = np.abs(out[valid] - ref[valid]).max()
    assert diff_valid < 1e-4, f"valid-token activation diff {diff_valid}"
    assert np.isfinite(out).all()
    diff_all = np.abs(out - ref).max()
    assert diff_all < 1e-2, f"padded-token activation diff {diff_all}"


def test_bert_forward_bf16_close_to_hf():
    """The production compute dtype (bf16 matmuls, fp32 LN/softmax) stays
    within bf16 tolerance of the HF fp32 reference — the precision contract
    the dump/serve path relies on."""
    hf, cfg, params = _hf_pair(seed=3)
    rng = np.random.default_rng(9)
    b, l = 2, 48
    input_ids = rng.integers(1, cfg.vocab_size, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(input_ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(bert_forward(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(input_ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        config=cfg, deterministic=True, attn_impl="xla",
        compute_dtype=jnp.bfloat16,
    ))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"bf16 relative diff {rel}"


# ---------------------------------------------------------------------------
# Loss-level golden: literal reference formulas (recomputed from scratch in
# torch/numpy) vs rc_loss's fused implementations.
# ---------------------------------------------------------------------------


def _loss_fixture():
    cfg = BertConfig.tiny(vocab_size=128)
    params = init_encoder_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(11)
    b, l, lq = 4, 24, 10
    batch = {
        "input_ids": rng.integers(3, cfg.vocab_size, (b, l)).astype(np.int32),
        "attention_mask": np.ones((b, l), np.int32),
        "token_type_ids": np.zeros((b, l), np.int32),
        "query_input_ids": rng.integers(3, cfg.vocab_size, (b, lq)).astype(np.int32),
        "query_attention_mask": np.ones((b, lq), np.int32),
        "query_token_type_ids": np.zeros((b, lq), np.int32),
        "start_positions": np.array([3, 5, 1, 7], np.int32),
        "end_positions": np.array([4, 9, 2, 7], np.int32),
    }
    return cfg, params, {k: jnp.asarray(v) for k, v in batch.items()}, (b, l)


def test_single_loss_matches_literal_dense_logits_mean():
    """Reference computes CE(dense_logits.mean(2), start) where
    dense_logits[b,i,j] = start_logits[b,i] + end_logits[b,j]
    (ref: encoder.py:206-209,273-278). rc_loss computes CE(start_logits)
    directly; prove the equivalence numerically end to end."""
    cfg, params, batch, (b, l) = _loss_fixture()
    with jax.default_matmul_precision("highest"):
        total, aux = rc_loss(params, cfg, batch, RCLossConfig(),
                             deterministic=True, attn_impl="xla")
        s_logits = np.asarray(aux["start_logits"], np.float64)
        e_logits = np.asarray(aux["end_logits"], np.float64)

    dense = s_logits[:, :, None] + e_logits[:, None, :]  # [B, L, L]
    tl_s = torch.from_numpy(dense.mean(axis=2))
    tl_e = torch.from_numpy(dense.mean(axis=1))
    ce = torch.nn.CrossEntropyLoss()
    sp = torch.from_numpy(np.asarray(batch["start_positions"])).long()
    ep = torch.from_numpy(np.asarray(batch["end_positions"])).long()
    ref_loss = 0.5 * (ce(tl_s, sp) + ce(tl_e, ep)).item()
    assert abs(float(total) - ref_loss) < 1e-5


def test_filter_loss_matches_torch_bce_pos_weight():
    """Filter BCE with pos_weight = seq length (ref: encoder.py:337-355),
    recomputed with torch.nn.BCEWithLogitsLoss."""
    cfg, params, batch, (b, l) = _loss_fixture()
    loss_cfg = RCLossConfig(lambda_flt=1.0)
    with jax.default_matmul_precision("highest"):
        total, aux = rc_loss(params, cfg, batch, loss_cfg,
                             deterministic=True, attn_impl="xla")
    f_s = torch.from_numpy(np.asarray(aux["filter_start_logits"], np.float32))
    f_e = torch.from_numpy(np.asarray(aux["filter_end_logits"], np.float32))
    sp = np.asarray(batch["start_positions"])
    ep = np.asarray(batch["end_positions"])
    tgt_s = torch.from_numpy(np.eye(l, dtype=np.float32)[sp])
    tgt_e = torch.from_numpy(np.eye(l, dtype=np.float32)[ep])
    bce = torch.nn.BCEWithLogitsLoss(reduction="none",
                                     pos_weight=torch.tensor(float(l)))
    per_ex = 0.5 * bce(f_s, tgt_s).mean(1) + 0.5 * bce(f_e, tgt_e).mean(1)
    # all examples here have answers (start_positions > 0)
    ref_flt = per_ex.mean().item()
    got_flt = float(aux["filter_loss"])
    assert abs(got_flt - ref_flt) < 1e-4


def test_neg_loss_matches_literal_in_batch_ce():
    """In-batch negative CE: logits = query · gold_phrase_reps^T with the
    diagonal as the positive (ref: encoder.py:220-257,324-335)."""
    cfg, params, batch, (b, l) = _loss_fixture()
    loss_cfg = RCLossConfig(lambda_neg=1.0)
    with jax.default_matmul_precision("highest"):
        total, aux = rc_loss(params, cfg, batch, loss_cfg,
                             deterministic=True, attn_impl="xla")
        qs, qe = embed_query(params, cfg, batch["query_input_ids"],
                             batch["query_attention_mask"],
                             batch["query_token_type_ids"],
                             deterministic=True, attn_impl="xla")
    gold_s = np.asarray(aux["gold_start"], np.float64)
    gold_e = np.asarray(aux["gold_end"], np.float64)
    qs = np.asarray(qs, np.float64)
    qe = np.asarray(qe, np.float64)
    ce = torch.nn.CrossEntropyLoss()
    labels = torch.arange(b)
    ref_neg = 0.5 * (
        ce(torch.from_numpy(qs @ gold_s.T), labels)
        + ce(torch.from_numpy(qe @ gold_e.T), labels)
    ).item()
    assert abs(float(aux["neg_loss"]) - ref_neg) < 1e-5
    assert abs(float(total) - (float(aux["single_loss"]) + ref_neg)) < 1e-5


def test_gold_reps_are_phrase_vectors_at_answer_positions():
    """The negatives queue must hold the phrase tower's vectors at the gold
    (start, end) token positions (ref: encoder.py:236-243)."""
    cfg, params, batch, (b, l) = _loss_fixture()
    with jax.default_matmul_precision("highest"):
        _, aux = rc_loss(params, cfg, batch, RCLossConfig(lambda_neg=1.0),
                         deterministic=True, attn_impl="xla")
        start, end, _, _ = embed_phrase(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], deterministic=True, attn_impl="xla")
    sp = np.asarray(batch["start_positions"])
    ep = np.asarray(batch["end_positions"])
    want_s = np.asarray(start)[np.arange(b), sp]
    want_e = np.asarray(end)[np.arange(b), ep]
    np.testing.assert_allclose(np.asarray(aux["gold_start"]), want_s, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["gold_end"]), want_e, atol=1e-6)
