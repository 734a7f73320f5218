"""Unicode / edge-case correctness of the exact-offset pipeline — offsets
are THE correctness-critical invariant of the store."""

import jax
import numpy as np

from densephrases_tpu.data.features import (
    build_doc_context,
    convert_context_to_features,
    whitespace_split,
)
from densephrases_tpu.data.tokenization import train_wordpiece_vocab


def test_whitespace_split_unicode():
    text = "Müller scored the  goal\tin Zürich"
    words, c2w = whitespace_split(text)
    assert words == ["Müller", "scored", "the", "goal", "in", "Zürich"]
    assert len(c2w) == len(text)
    # char-to-word maps each word's chars to its index
    assert c2w[0] == 0 and c2w[text.index("Zürich")] == 5


def test_doc_context_offsets_with_accents_and_punct():
    paras = ["Müller's goal (2009) was décisive.",
             "Ça alors — «quotes» et ponctuation!"]
    tok = train_wordpiece_vocab(paras, vocab_size=500)
    ctx, token_ids, bounds = build_doc_context(0, "Tïtle", paras, tok)
    # every token's char span slices a non-empty word-boundary substring
    for t in range(ctx.n_tokens):
        s, e = ctx.token_char_span(t)
        assert 0 <= s < e <= len(ctx.context)
        piece = ctx.context[s:e]
        assert piece and " [PAR] " not in piece
    # the context contains both paragraphs verbatim (normalized spacing)
    assert "Müller's" in ctx.context and "«quotes»" in ctx.context


def test_empty_and_whitespace_paragraphs():
    tok = train_wordpiece_vocab(["some words here"], vocab_size=300)
    feats, ctx = convert_context_to_features(
        0, "T", ["   ", "some words here", ""], tok, max_seq_length=32)
    assert ctx.n_tokens > 0
    total = sum(f.content_len for f in feats)
    assert total == ctx.n_tokens


def test_empty_question_features():
    from densephrases_tpu.data.features import convert_questions_to_features

    tok = train_wordpiece_vocab(["hello world"], vocab_size=300)
    feats = convert_questions_to_features(["", "hello"], tok, 8)
    assert len(feats) == 2
    assert feats[0].attention_mask.sum() == 2  # [CLS] [SEP] only


def test_fast_and_python_tokenizer_paths_agree():
    """Queries use the Rust fast path, contexts the python path — they must
    tokenize identically (punctuation isolation + CJK splitting, matching HF
    BasicTokenizer semantics)."""
    from densephrases_tpu.data.tokenization import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "?", "!", "$",
             "5", "a", "b", "##?", "##a", "the", "##s", "'", "s", "…",
             "中", "国", "##中", "e"]
    tok = WordPieceTokenizer(vocab={v: i for i, v in enumerate(vocab)},
                             do_lower_case=True)
    if tok._fast_backend() is None:
        import pytest
        pytest.skip("tokenizers backend unavailable")
    cases = ["???", "a?b", "the$5", "a's", "中国a", "a…b", "!!a??", "Café"]
    for t in cases:
        py = tok.convert_tokens_to_ids(tok.tokenize(t))
        fast = tok.encode_batch_ids([t])[0]
        assert py == fast, f"{t!r}: python {py} != fast {fast}"
