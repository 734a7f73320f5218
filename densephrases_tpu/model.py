"""DensePhrases facade: the user-facing API.

Parity with the reference facade (ref: densephrases/model.py:14-128):
``search`` over retrieval units phrase / sentence / paragraph / document with
the same unit→aggregation-strategy mapping and 2× over-retrieval for
non-phrase units (ref: model.py:76-87), plus ``evaluate``.

TPU-native differences: the encoder is a jitted JAX function; the index is the
on-device MIPS engine; queries are encoded and searched in one flow with no
HTTP hop (serving adds that boundary separately in densephrases_tpu/serve).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.data.features import convert_questions_to_features
from densephrases_tpu.data.tokenization import WordPieceTokenizer
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import embed_query

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("config", "attn_impl"))
def _query_forward(params, input_ids, attention_mask, token_type_ids,
                   *, config: BertConfig, attn_impl: str = "auto"):
    qs, qe = embed_query(params, config, input_ids, attention_mask,
                         token_type_ids, deterministic=True, attn_impl=attn_impl)
    return qs, qe


class DensePhrases:
    """Load an encoder + phrase index and answer queries
    (ref: densephrases/model.py)."""

    UNIT_TO_STRAT = {  # ref: model.py:76-87
        "phrase": "opt1",
        "sentence": "opt2",
        "paragraph": "opt2",
        "document": "opt3",
    }

    def __init__(self, params, config: BertConfig, tokenizer: WordPieceTokenizer,
                 mips: MIPS, max_query_length: int = 64, truecase=None,
                 attn_impl: str = "auto", serve_dtype=None):
        if serve_dtype is not None:
            # bf16-resident weights for serving: halves weight HBM traffic
            # and removes the per-layer fp32→bf16 cast from the hot path
            # (training keeps fp32 masters; LN/softmax still accumulate
            # fp32 inside bert_forward). Opt-in because it perturbs logits
            # at the bf16 ulp level vs the fp32-weight path.
            dt = jnp.bfloat16 if serve_dtype in ("bf16", jnp.bfloat16) \
                else serve_dtype
            params = jax.tree.map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, params)
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.mips = mips
        self.max_query_length = max_query_length
        self.truecase = truecase
        self.attn_impl = attn_impl

    # ----- query encoding (ref: open_utils.py:83-101 query2vec) -----
    def query2vec(self, queries: List[str]):
        """Returns [B, 2H] query vectors as a DEVICE array — the subsequent
        MIPS stages consume it on device, so no host round-trip occurs."""
        feats = convert_questions_to_features(
            queries, self.tokenizer, self.max_query_length)
        ids = jnp.asarray(np.stack([f.input_ids for f in feats]))
        am = jnp.asarray(np.stack([f.attention_mask for f in feats]))
        tt = jnp.asarray(np.stack([f.token_type_ids for f in feats]))
        qs, qe = _query_forward(self.params, ids, am, tt,
                                config=self.config, attn_impl=self.attn_impl)
        return jnp.concatenate([qs, qe], axis=1)  # [B, 2H]

    # ----- search (ref: model.py:55-109) -----
    def search(self, query: Union[str, List[str]], retrieval_unit: str = "phrase",
               top_k: int = 10, truecase: bool = True, return_meta: bool = False,
               max_answer_length: int = 10):
        single = isinstance(query, str)
        queries = [query] if single else list(query)
        if truecase and self.truecase is not None:
            queries = [
                q if q != q.lower() else self.truecase.get_true_case(q)
                for q in queries
            ]

        if retrieval_unit not in self.UNIT_TO_STRAT:
            raise NotImplementedError(f"unknown retrieval unit {retrieval_unit}")
        agg_strat = self.UNIT_TO_STRAT[retrieval_unit]
        # 2x over-retrieval for coarser units (ref: model.py:79-81)
        search_top_k = top_k if retrieval_unit == "phrase" else top_k * 2

        query_vec = self.query2vec(queries)
        rets = self.mips.search(
            query_vec, q_texts=queries, top_k=search_top_k, aggregate=True,
            agg_strat=agg_strat, return_sent=(retrieval_unit == "sentence"),
            max_answer_length=max_answer_length,
        )
        if retrieval_unit == "phrase":
            answers = [[r["answer"] for r in ret[:top_k]] for ret in rets]
        elif retrieval_unit in ("sentence", "paragraph"):
            answers = [[r["context"] for r in ret[:top_k]] for ret in rets]
        else:  # document
            answers = [[r["title"][0] for r in ret[:top_k]] for ret in rets]
        rets = [ret[:top_k] for ret in rets]

        if single:
            answers, rets = answers[0], rets[0]
        return (answers, rets) if return_meta else answers

    def evaluate(self, qa_pairs, top_k: int = 10, regex: bool = False,
                 max_answer_length: int = 10):
        """qa_pairs: list of (question, [answers]). Returns metrics dict
        (ref: model.py:118-128 delegating to eval_phrase_retrieval)."""
        from densephrases_tpu.eval.retrieval import evaluate_retrieval
        return evaluate_retrieval(self, qa_pairs, top_k=top_k, regex=regex,
                                  max_answer_length=max_answer_length)
