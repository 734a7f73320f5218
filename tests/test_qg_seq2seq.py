"""Exercise the HF seq2seq QG plug with a REAL transformers model.

The reference's generator is a T5 QG checkpoint
(ref: scripts/question_generation/generate_squad.py:14). No hub access
exists in this environment, so the test builds a tiny random-weights
BART seq2seq + WordLevel tokenizer ON DISK and drives
``hf_seq2seq_qg`` through the same AutoTokenizer/AutoModelForSeq2SeqLM
local_files_only load path a user would hit with real QG weights —
asserting the plug's contract end-to-end (highlight splicing at the
matched span, batching, (q, a, answer_start) output, generate_squad
integration), not question quality.
"""

import json
import os

import pytest

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from densephrases_tpu.tools.question_generation import (
    generate_squad,
    hf_seq2seq_qg,
)

CONTEXT = (
    "The city of Springfield was founded in 1821 by Thomas Pynchon. "
    "Thomas Pynchon later moved to Boston, and Springfield grew to "
    "120000 residents."
)


@pytest.fixture(scope="module")
def tiny_seq2seq_dir(tmp_path_factory):
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import BartConfig, BartForConditionalGeneration
    from transformers import PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("tiny_qg_model")
    words = ("what when where who is was the a of in founded moved city "
             "residents grew generate question later and by to").split()
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "<hl>": 4}
    for w in words:
        vocab[w] = len(vocab)
    tok_core = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok_core.pre_tokenizer = pre_tokenizers.Whitespace()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=tok_core, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>")
    tok.save_pretrained(str(path))

    cfg = BartConfig(
        vocab_size=len(vocab), d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1, forced_eos_token_id=None)
    torch.manual_seed(0)
    BartForConditionalGeneration(cfg).save_pretrained(str(path))
    return str(path)


def test_hf_qg_fn_contract(tiny_seq2seq_dir):
    qg_fn = hf_seq2seq_qg(tiny_seq2seq_dir, max_questions=3,
                          max_input_len=128, max_output_len=12)
    out = qg_fn(CONTEXT)
    assert isinstance(out, list)
    # every emitted answer is pinned to a real occurrence at its offset
    for q, a, start in out:
        assert isinstance(q, str) and q
        assert CONTEXT[start:start + len(a)] == a
    # the second "Thomas Pynchon" / "Springfield" must never alias the
    # first occurrence: starts are the matched offsets, hence unique
    starts = [s for _, _, s in out]
    assert len(set(starts)) == len(starts)


def test_generate_squad_with_hf_plug(tiny_seq2seq_dir, tmp_path):
    qg_fn = hf_seq2seq_qg(tiny_seq2seq_dir, max_questions=2,
                          max_input_len=128, max_output_len=8)
    out_path = os.path.join(tmp_path, "qg.json")
    docs = [{"title": "Springfield", "paragraphs": [CONTEXT]}]
    n = generate_squad(docs, out_path, qg_fn=qg_fn)
    data = json.load(open(out_path))["data"]
    # structural SQuAD validity, gold spans verified against the context
    total = 0
    for art in data:
        for par in art["paragraphs"]:
            for qa in par["qas"]:
                ans = qa["answers"][0]
                s = ans["answer_start"]
                assert par["context"][s:s + len(ans["text"])] == ans["text"]
                total += 1
    assert total == n
