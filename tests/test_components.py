"""Tests: checkpointing, truecase, QA loading, RC collation, HF import."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densephrases_tpu.data.qa import load_qa_pairs, load_rc_examples
from densephrases_tpu.data.rc_dataset import batches, convert_rc_examples
from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.data.truecase import TrueCaser
from densephrases_tpu.models.bert import BertConfig, bert_forward, init_bert_params
from densephrases_tpu.models.hf_import import bert_params_from_state_dict
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.train.rc import create_train_state, make_optimizer
from densephrases_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


# ---------------------------------------------------------------- checkpoint
def test_checkpoint_round_trip(tmp_path):
    cfg = BertConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(total_steps=10)
    state = create_train_state(params, opt, pbn_size=2, batch_size=2,
                               hidden=cfg.hidden_size)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    assert latest_checkpoint(str(tmp_path / "ckpt")).endswith("step_7")
    fresh = create_train_state(params, opt, pbn_size=2, batch_size=2,
                               hidden=cfg.hidden_size)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    chex_equal = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), state.params, restored.params))
    assert chex_equal


# ---------------------------------------------------------------- truecase
def test_truecaser_learns_casing():
    tc = TrueCaser()
    tc.train([
        "He visited New York City last week .",
        "The mayor of New York spoke .",
        "I love New York .",
        "Barack Obama was president .",
        "Obama went to Washington .",
    ] * 3)
    out = tc.get_true_case("who is the mayor of new york")
    assert "New York" in out
    out2 = tc.get_true_case("when did obama visit washington")
    assert "Obama" in out2 and "Washington" in out2


def test_truecaser_save_load(tmp_path):
    tc = TrueCaser()
    tc.train(["Paris is in France ."] * 3)
    p = str(tmp_path / "tc.pkl")
    tc.save(p)
    tc2 = TrueCaser(p)
    assert "France" in tc2.get_true_case("is paris in france")


# ---------------------------------------------------------------- qa loading
def test_load_qa_pairs(tmp_path):
    path = str(tmp_path / "qa.json")
    json.dump({"data": [
        {"id": "1", "question": "who won the cup?", "answers": ["France"]},
        {"id": "2", "question": "x [START_ENT] y", "answers": "B"},
    ]}, open(path, "w"))
    ids, qs, ans = load_qa_pairs(path)
    assert ids == ["1", "2"]
    assert qs[0] == "who won the cup"  # '?' stripped
    assert ans == [["France"], ["B"]]


def test_load_rc_examples(tmp_path):
    path = str(tmp_path / "squad.json")
    json.dump({"data": [{
        "title": "T",
        "paragraphs": [{
            "context": "The sky is blue today.",
            "qas": [{"id": "q1", "question": "what color is the sky?",
                     "answers": [{"text": "blue", "answer_start": 11}]}],
        }],
    }]}, open(path, "w"))
    ex = load_rc_examples(path)
    assert len(ex) == 1
    assert ex[0]["answer_text"] == "blue"
    assert ex[0]["context"][ex[0]["answer_start"]:][:4] == "blue"


# ---------------------------------------------------------------- collation
@pytest.fixture(scope="module")
def rc_setup():
    ctx = ("The quick brown fox jumps over the lazy dog . "
           "Paris is the capital of France . " * 3)
    examples = [{
        "qid": "q1", "question": "what is the capital of France",
        "title": "Geo", "context": ctx,
        "answer_text": "Paris", "answer_start": ctx.index("Paris"),
    }, {
        "qid": "q2", "question": "unanswerable question",
        "title": "Geo", "context": ctx, "answer_text": "", "answer_start": -1,
    }]
    tok = train_wordpiece_vocab([ctx, "capital France Paris fox dog"],
                                vocab_size=600)
    return examples, tok


def test_rc_collation_answer_alignment(rc_setup):
    examples, tok = rc_setup
    feats = convert_rc_examples(examples, tok, max_seq_length=64,
                                doc_stride=32, max_query_length=16)
    f = feats[0]
    s, e = f.start_position, f.end_position
    assert s > 0 and e >= s
    # tokens at [s, e] must decode back to the answer word
    toks = tok.convert_ids_to_tokens(f.input_ids[s:e + 1].tolist())
    surface = "".join(t[2:] if t.startswith("##") else t for t in toks)
    assert surface == "paris"
    # unanswerable → [CLS] position
    assert feats[1].start_position == 0 and feats[1].end_position == 0


def test_rc_collation_teacher_inputs(rc_setup):
    examples, tok = rc_setup
    feats = convert_rc_examples(examples, tok, max_seq_length=64,
                                doc_stride=32, max_query_length=16,
                                with_teacher=True)
    f = feats[0]
    assert f.cross_input_ids is not None
    q_len = int(f.query_attention_mask.sum())
    # cross input starts with the query tokens
    np.testing.assert_array_equal(f.cross_input_ids[:q_len],
                                  f.query_input_ids[:q_len])
    # gather map points content positions at cross positions holding the
    # same token ids
    g = f.teacher_gather
    for p_pos in range(1, len(g)):
        if g[p_pos] >= 0 and p_pos > 0:
            assert f.cross_input_ids[g[p_pos]] == f.input_ids[p_pos], p_pos


def test_rc_batches_resume_skip(rc_setup):
    examples, tok = rc_setup
    feats = convert_rc_examples(examples * 4, tok, max_seq_length=64,
                                doc_stride=32, max_query_length=16)
    all_b = list(batches(feats, 2, shuffle=True, seed=1))
    skipped = list(batches(feats, 2, shuffle=True, seed=1, skip_steps=2))
    assert len(skipped) == len(all_b) - 2
    np.testing.assert_array_equal(all_b[2]["input_ids"], skipped[0]["input_ids"])


# ---------------------------------------------------------------- hf import
def test_hf_import_forward_equivalence():
    """Build a torch-style state_dict from random tensors, import, and check
    the forward pass against a manual per-layer reference computation."""
    torch = pytest.importorskip("torch")
    cfg = BertConfig.tiny(vocab_size=128)
    n, h, f = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "embeddings.word_embeddings.weight": t(cfg.vocab_size, h),
        "embeddings.position_embeddings.weight": t(cfg.max_position_embeddings, h),
        "embeddings.token_type_embeddings.weight": t(cfg.type_vocab_size, h),
        "embeddings.LayerNorm.weight": torch.ones(h),
        "embeddings.LayerNorm.bias": torch.zeros(h),
    }
    for i in range(n):
        p = f"encoder.layer.{i}."
        sd.update({
            p + "attention.self.query.weight": t(h, h),
            p + "attention.self.query.bias": t(h),
            p + "attention.self.key.weight": t(h, h),
            p + "attention.self.key.bias": t(h),
            p + "attention.self.value.weight": t(h, h),
            p + "attention.self.value.bias": t(h),
            p + "attention.output.dense.weight": t(h, h),
            p + "attention.output.dense.bias": t(h),
            p + "attention.output.LayerNorm.weight": torch.ones(h),
            p + "attention.output.LayerNorm.bias": torch.zeros(h),
            p + "intermediate.dense.weight": t(f, h),
            p + "intermediate.dense.bias": t(f),
            p + "output.dense.weight": t(h, f),
            p + "output.dense.bias": t(h),
            p + "output.LayerNorm.weight": torch.ones(h),
            p + "output.LayerNorm.bias": torch.zeros(h),
        })
    params = bert_params_from_state_dict(sd, cfg)
    # imported layer 0 q_w must equal torch weight transposed
    np.testing.assert_allclose(
        params["layers"]["q_w"][0],
        sd["encoder.layer.0.attention.self.query.weight"].numpy().T, rtol=1e-6)
    ids = jnp.asarray(np.arange(10)[None, :] % cfg.vocab_size)
    out = bert_forward(params, ids, jnp.ones_like(ids), config=cfg,
                       attn_impl="xla", compute_dtype=jnp.float32)
    assert out.shape == (1, 10, h)
    assert np.isfinite(np.asarray(out)).all()
