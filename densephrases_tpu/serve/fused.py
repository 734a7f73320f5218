"""Fused serve path: token ids → span ids in ONE device dispatch.

The modular pipeline (model.query2vec → MIPS.search_dense →
MIPS.search_phrase) costs three device dispatches; on hosts with
non-trivial dispatch latency that dominates single-query serving. This
composes the whole hot path — query towers, stage-1 MIPS scan, stage-2
constrained span rescore — into one jitted program. The host receives one
small bundle (span ids + char-lookup inputs) and only assembles strings.

Limitations: single-device FlatIndex engine (the production default below
the IVF regime; see docs/ARCHITECTURE.md §3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.index.flat import _scan_topk
from densephrases_tpu.index.search import MIPS, _rescore_spans
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import embed_query


@functools.partial(
    jax.jit,
    static_argnames=("config", "top_k", "max_answer_length", "chunk",
                     "attn_impl"))
def _fused_serve(params, input_ids, attention_mask, token_type_ids,
                 codes, f2o, doc_end_row, doc_base_row, offset, scale,
                 n_total, *, config: BertConfig, top_k: int,
                 max_answer_length: int, chunk: int, attn_impl: str):
    # 1) encode query (two towers, one program)
    qs, qe = embed_query(params, config, input_ids, attention_mask,
                         token_type_ids, deterministic=True,
                         attn_impl=attn_impl)
    b = qs.shape[0]

    # 2) stage-1 MIPS over the flat int8 corpus
    stacked = jnp.concatenate([qs, qe], axis=0)
    scores, gids = _scan_topk(stacked, codes, n_total, offset, scale,
                              top_k=top_k, chunk=chunk)
    s_scores, e_scores = scores[:b], scores[b:]
    s_gids, e_gids = gids[:b], gids[b:]

    # 3) stage-2 constrained span rescore
    res = _rescore_spans(
        qs, qe, s_gids, e_gids, s_scores, e_scores,
        codes, f2o, doc_end_row, doc_base_row, offset, scale,
        max_answer_length=max_answer_length, return_vecs=False)
    return res, s_gids, e_gids


class FusedServer:
    """Wraps a DensePhrases model whose MIPS runs a single-device FlatIndex
    into the one-dispatch serve path. Drop-in for .search with phrase unit."""

    def __init__(self, model, chunk: Optional[int] = None):
        from densephrases_tpu.index.flat import FlatIndex

        self.model = model
        mips: MIPS = model.mips
        index = mips.index
        assert isinstance(index, FlatIndex) and index.mesh is None \
            and index.quant == "int8", (
            "fused serving needs a single-device int8 FlatIndex")
        assert index.codes.ndim == 2, "fused serving needs the flat 2D buffer"
        self.mips = mips
        self.index = index
        self.chunk = chunk or index.chunk

    def submit(self, queries, top_k: int = 10, max_answer_length: int = 10,
               aggregate: bool = True, agg_strat: str = "opt1",
               return_sent: bool = False, truecase: bool = True):
        """Tokenize + dispatch without blocking. JAX dispatch is async, so
        the returned handle's device arrays are still being computed; pass
        it to ``collect`` to block and assemble. Submitting batch i+1
        before collecting batch i keeps the device queue full — under load
        this hides dispatch/tunnel latency behind compute."""
        from densephrases_tpu.data.features import convert_questions_to_features

        model = self.model
        # Same truecase preprocessing as DensePhrases.search — the fused and
        # modular paths must see identical query text (ref: model.py:66-67).
        if truecase and model.truecase is not None:
            queries = [
                q if q != q.lower() else model.truecase.get_true_case(q)
                for q in queries
            ]
        feats = convert_questions_to_features(
            queries, model.tokenizer, model.max_query_length)
        ids = jnp.asarray(np.stack([f.input_ids for f in feats]))
        am = jnp.asarray(np.stack([f.attention_mask for f in feats]))
        tt = jnp.asarray(np.stack([f.token_type_ids for f in feats]))

        res, s_gids, e_gids = _fused_serve(
            model.params, ids, am, tt,
            self.index.codes, self.mips.f2o_dev, self.mips.doc_end_dev,
            self.mips.doc_base_dev, jnp.float32(self.mips.store.offset),
            jnp.float32(self.mips.store.scale), jnp.int32(self.index.n_total),
            config=model.config, top_k=top_k,
            max_answer_length=max_answer_length, chunk=self.chunk,
            attn_impl=model.attn_impl)
        return {"res": res, "s_gids": s_gids, "e_gids": e_gids,
                "queries": queries, "top_k": top_k, "aggregate": aggregate,
                "agg_strat": agg_strat, "return_sent": return_sent}

    def collect(self, handle):
        """Block on a ``submit`` handle and assemble result dicts."""
        # ONE device→host transfer for everything stage 3 needs
        res, s_gids, e_gids = jax.device_get(
            (handle["res"], handle["s_gids"], handle["e_gids"]))
        outs = self.mips._assemble(res, np.asarray(s_gids),
                                   np.asarray(e_gids), return_idxs=False,
                                   return_sent=handle["return_sent"])
        if handle["aggregate"]:
            outs = [self.mips.aggregate_results(
                        r, handle["top_k"], q, handle["agg_strat"])
                    for r, q in zip(outs, handle["queries"])]
        return outs

    def search(self, queries, top_k: int = 10, max_answer_length: int = 10,
               aggregate: bool = True, agg_strat: str = "opt1",
               return_sent: bool = False, truecase: bool = True):
        return self.collect(self.submit(
            queries, top_k=top_k, max_answer_length=max_answer_length,
            aggregate=aggregate, agg_strat=agg_strat,
            return_sent=return_sent, truecase=truecase))

    def search_pipelined(self, query_batches, depth: int = 2, **kwargs):
        """Serve a stream of query batches with `depth` dispatches in
        flight (steady-state server-under-load throughput: host assembly
        of batch i overlaps device compute of batches i+1..i+depth)."""
        handles, outs = [], []
        for qb in query_batches:
            handles.append(self.submit(qb, **kwargs))
            if len(handles) >= depth:
                outs.append(self.collect(handles.pop(0)))
        while handles:
            outs.append(self.collect(handles.pop(0)))
        return outs
