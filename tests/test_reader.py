"""Cross-encoder single-passage reading: train a tiny teacher to overfit,
then read out the right answer (serve_bert_encoder parity)."""

import jax
import numpy as np

from densephrases_tpu.data.rc_dataset import convert_rc_examples
from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.eval.reader import build_cq_inputs, read_passages
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.train.cross_encoder import train_cross_encoder


def test_build_cq_inputs_maps_words():
    tok = train_wordpiece_vocab(["alpha beta gamma delta"], vocab_size=300)
    ids, mask, types, wm, words = build_cq_inputs(
        ["what is beta"], ["alpha beta gamma delta"], tok, max_length=32)
    assert ids.shape == (1, 32)
    assert words[0] == ["alpha", "beta", "gamma", "delta"]
    covered = wm[0][wm[0] >= 0]
    assert set(covered.tolist()) == {0, 1, 2, 3}
    # type ids mark the passage segment
    assert types[0][np.nonzero(wm[0] >= 0)[0][0]] == 1


def test_reader_extracts_trained_answer():
    ctx = "the quick brown fox jumps over the lazy dog today"
    examples = [{"qid": str(i), "question": "what jumps over the dog",
                 "title": "T", "context": ctx, "answer_text": "fox",
                 "answer_start": ctx.index("fox")} for i in range(4)]
    tok = train_wordpiece_vocab([ctx, "what jumps over the dog"],
                                vocab_size=300)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    feats = convert_rc_examples(examples, tok, max_seq_length=64,
                                doc_stride=32, max_query_length=16,
                                with_teacher=True)
    params, losses = train_cross_encoder(cfg, feats, epochs=25, batch_size=4,
                                         lr=1e-3, attn_impl="xla")
    assert losses[-1] < losses[0] * 0.3
    out = read_passages(params, cfg, tok, ["what jumps over the dog"], [ctx],
                        max_length=64, attn_impl="xla")
    assert out[0]["answer"] == "fox", out[0]
    assert out[0]["context"][out[0]["start_pos"]:out[0]["end_pos"]] == "fox"
