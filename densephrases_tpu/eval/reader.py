"""Single-passage reading with the cross-encoder.

Parity with the reference's single-passage demo path: the cross-encoder
reads (question, passage) pairs and extracts the answer span directly
(ref: run_demo.py:151-272 serve_bert_encoder; dataloaders
embed_utils.py:432-524 get_cq_results/get_bertqa_results,
squad_utils.py:1641-1685 get_cq_dataloader/get_bertqa_dataloader).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.data.features import whitespace_split
from densephrases_tpu.data.tokenization import WordPieceTokenizer
from densephrases_tpu.models.bert import BertConfig, bert_forward

logger = logging.getLogger(__name__)


def build_cq_inputs(questions: List[str], passages: List[str],
                    tokenizer: WordPieceTokenizer, max_length: int = 384):
    """[CLS] question [SEP] passage [SEP] inputs + token→passage-word maps."""
    batch_ids, batch_mask, batch_types, word_maps, words_all = [], [], [], [], []
    q_ids_all = tokenizer.encode_batch_ids(questions)
    for q_ids, passage in zip(q_ids_all, passages):
        words, _ = whitespace_split(passage)
        p_ids: List[int] = []
        tok2word: List[int] = []
        for wi, w in enumerate(words):
            sub = tokenizer.convert_tokens_to_ids(tokenizer.tokenize_word(w))
            p_ids.extend(sub)
            tok2word.extend([wi] * len(sub))
        head = [tokenizer.cls_token_id] + q_ids[:60] + [tokenizer.sep_token_id]
        room = max_length - len(head) - 1
        p_ids = p_ids[:room]
        tok2word = tok2word[:room]
        ids = head + p_ids + [tokenizer.sep_token_id]
        pad = max_length - len(ids)
        batch_ids.append(ids + [tokenizer.pad_token_id] * pad)
        batch_mask.append([1] * len(ids) + [0] * pad)
        types = [0] * len(head) + [1] * (len(p_ids) + 1) + [0] * pad
        batch_types.append(types)
        # token position in input_ids → passage word index (-1 outside)
        wm = np.full(max_length, -1, np.int32)
        wm[len(head): len(head) + len(tok2word)] = tok2word
        word_maps.append(wm)
        words_all.append(words)
    return (np.asarray(batch_ids, np.int32), np.asarray(batch_mask, np.int32),
            np.asarray(batch_types, np.int32), np.stack(word_maps), words_all)


@functools.partial(jax.jit, static_argnames=("config", "attn_impl"))
def _reader_forward(params, ids, mask, types, *, config, attn_impl="auto"):
    hidden = bert_forward(params["cross"], ids, mask, types, config=config,
                          deterministic=True, attn_impl=attn_impl)
    logits = jnp.einsum("blh,ho->blo", hidden,
                        params["qa_outputs"]["w"]) + params["qa_outputs"]["b"]
    return logits[..., 0], logits[..., 1]


def read_passages(cross_params, config: BertConfig,
                  tokenizer: WordPieceTokenizer,
                  questions: List[str], passages: List[str],
                  max_length: int = 384, max_answer_words: int = 10,
                  attn_impl: str = "auto") -> List[dict]:
    """Extract the best answer span from each (question, passage) pair.
    Returns [{'answer', 'score', 'start_pos', 'end_pos'}] with char offsets
    into the whitespace-normalized passage."""
    ids, mask, types, word_maps, words_all = build_cq_inputs(
        questions, passages, tokenizer, max_length)
    s_log, e_log = _reader_forward(
        cross_params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types),
        config=config, attn_impl=attn_impl)
    s_log, e_log = np.asarray(s_log), np.asarray(e_log)

    out = []
    for bi in range(len(questions)):
        valid = word_maps[bi] >= 0
        s = np.where(valid, s_log[bi], -1e9)
        e = np.where(valid, e_log[bi], -1e9)
        s_top = np.argsort(-s)[:10]
        best = (-1e18, 0, 0)
        for si in s_top:
            for ei in range(si, min(si + 30, len(e))):
                if not valid[ei]:
                    break
                if word_maps[bi][ei] - word_maps[bi][si] >= max_answer_words:
                    break
                sc = float(s[si] + e[ei])
                if sc > best[0]:
                    best = (sc, int(si), int(ei))
        score, si, ei = best
        words = words_all[bi]
        w0, w1 = int(word_maps[bi][si]), int(word_maps[bi][ei])
        norm = " ".join(words)
        starts = np.cumsum([0] + [len(w) + 1 for w in words])
        out.append({
            "answer": " ".join(words[w0:w1 + 1]),
            "score": score,
            "start_pos": int(starts[w0]),
            "end_pos": int(starts[w1] + len(words[w1])),
            "context": norm,
        })
    return out
