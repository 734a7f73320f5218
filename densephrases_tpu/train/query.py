"""Query-side fine-tuning: train the query towers against a frozen index,
with live retrieval in the training loop.

TPU-native re-design of the reference query-FT driver
(ref: train_query.py:34-275):

- A *frozen* copy of the query towers embeds each question batch and
  searches the index (``get_top_phrases`` parity, ref: train_query.py:182-205
  — `mips.search(..., return_idxs=True)` returns the candidate phrase
  start/end vectors directly, no reconstruct pass needed because the store is
  position-addressable).
- Candidates are annotated on the host: phrase targets by EM/regex answer
  match, doc targets by title match (ref: annotate_phrase_vecs,
  train_query.py:208-275), expressed as [B, C] boolean masks (static shapes).
- The train step optimizes ONLY the query towers with the MML objective
  (ref: encoder.py:369-429 via models/encoder.query_loss); phrase-tower and
  filter parameters are frozen by construction (they are simply not passed to
  the optimizer).
- Periodic refresh: the frozen search towers are re-synced to the trained
  towers every ``update_freq`` epochs (ref: train_query.py:174-176).

Because the index lives in device HBM, search-in-the-loop costs no host
round-trip for the MIPS scan itself — only the target annotation (string
matching) runs on host.
"""

from __future__ import annotations

import copy
import functools
import logging
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from densephrases_tpu.eval.metrics import (
    drqa_exact_match_score,
    drqa_metric_max_over_ground_truths,
    drqa_regex_match_score,
    normalize_answer,
)
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import query_loss

logger = logging.getLogger(__name__)


@dataclass
class QueryFTConfig:
    top_k: int = 100
    learning_rate: float = 3e-5
    epochs: int = 3
    regex: bool = False
    label_strat: str = "phrase,doc"  # ref: options.py:177-187
    update_freq: int = 1  # epochs between frozen-tower refreshes
    max_answer_length: int = 10
    warmup_ratio: float = 0.1


def annotate_candidates(results: List[List[dict]], answers: List[List[str]],
                        titles: Optional[List[List[str]]] = None,
                        regex: bool = False, n_cands: int = 200):
    """Build [B, C] target masks from search results
    (ref: train_query.py:208-275).

    Returns (start_vecs, end_vecs, targets, p_targets, cand_mask) — all
    fixed-shape np arrays, dummy-padded to n_cands (ref pads to top_k*2,
    train_query.py:218-231)."""
    match_fn = drqa_regex_match_score if regex else drqa_exact_match_score
    b = len(results)
    dim = None
    for ret in results:
        for r in ret:
            if r.get("start_vec") is not None:
                dim = len(r["start_vec"])
                break
        if dim:
            break
    assert dim is not None, "search must be called with return_idxs=True"

    start_vecs = np.zeros((b, n_cands, dim), np.float32)
    end_vecs = np.zeros((b, n_cands, dim), np.float32)
    targets = np.zeros((b, n_cands), bool)
    p_targets = np.zeros((b, n_cands), bool)
    cand_mask = np.zeros((b, n_cands), bool)

    for bi, ret in enumerate(results):
        golds = answers[bi]
        gold_titles = ([normalize_answer(t) for t in titles[bi]]
                       if titles is not None else None)
        for ci, r in enumerate(ret[:n_cands]):
            if r.get("start_vec") is None:
                continue
            start_vecs[bi, ci] = r["start_vec"]
            end_vecs[bi, ci] = r["end_vec"]
            cand_mask[bi, ci] = True
            if golds and drqa_metric_max_over_ground_truths(
                    match_fn, r["answer"], golds):
                targets[bi, ci] = True
            if gold_titles is not None and r.get("title"):
                if any(normalize_answer(t) in gold_titles for t in r["title"]):
                    p_targets[bi, ci] = True
            elif golds:
                # doc-level positive: answer appears in the candidate context
                if any(normalize_answer(g) in normalize_answer(r["context"])
                       for g in golds):
                    p_targets[bi, ci] = True
    return start_vecs, end_vecs, targets, p_targets, cand_mask


def annotate_candidate_cols(results: List[List[dict]],
                            answers: List[List[str]],
                            titles: Optional[List[List[str]]] = None,
                            regex: bool = False, n_cands: int = 200):
    """Target annotation for the vecs-on-device search path.

    Like ``annotate_candidates`` but never touches vectors: each result
    dict carries ``cand_col`` (its column in the device-resident
    [B, 2K, D] candidate arrays), so this returns (cand_cols, targets,
    p_targets, cand_mask) — all [B, n_cands] — and the train step gathers
    the vectors it needs on device. Host work is pure string matching."""
    match_fn = drqa_regex_match_score if regex else drqa_exact_match_score
    b = len(results)
    cand_cols = np.zeros((b, n_cands), np.int32)
    targets = np.zeros((b, n_cands), bool)
    p_targets = np.zeros((b, n_cands), bool)
    cand_mask = np.zeros((b, n_cands), bool)

    for bi, ret in enumerate(results):
        golds = answers[bi]
        gold_titles = ([normalize_answer(t) for t in titles[bi]]
                       if titles is not None else None)
        for ci, r in enumerate(ret[:n_cands]):
            cand_cols[bi, ci] = r["cand_col"]
            cand_mask[bi, ci] = True
            if golds and drqa_metric_max_over_ground_truths(
                    match_fn, r["answer"], golds):
                targets[bi, ci] = True
            if gold_titles is not None and r.get("title"):
                if any(normalize_answer(t) in gold_titles for t in r["title"]):
                    p_targets[bi, ci] = True
            elif golds:
                if any(normalize_answer(g) in normalize_answer(r["context"])
                       for g in golds):
                    p_targets[bi, ci] = True
    return cand_cols, targets, p_targets, cand_mask


def make_query_train_step(config: BertConfig, optimizer, label_strat: str,
                          attn_impl: str = "auto"):
    """Jitted step updating ONLY query-tower params.

    The trainable pytree is {'query_start':…, 'query_end':…}; all other
    towers stay in `frozen_params` (gradient-free by construction — the
    reference freezes via requires_grad, train_query.py:37-42)."""
    use_phrase = "phrase" in label_strat
    use_doc = "doc" in label_strat

    @jax.jit
    def step(q_params, opt_state, frozen_rest, batch, rng):
        def loss_fn(qp):
            params = dict(frozen_rest)
            params.update(qp)
            t = batch["targets"] if use_phrase else jnp.zeros_like(batch["targets"])
            pt = batch["p_targets"] if use_doc else jnp.zeros_like(batch["p_targets"])
            sv, ev = batch["start_vecs"], batch["end_vecs"]
            if "cand_cols" in batch:
                # vecs-on-device path: sv/ev are the raw [B, 2K, D] search
                # outputs; gather the annotated candidate order on device
                cols = batch["cand_cols"][..., None]
                sv = jnp.take_along_axis(sv, cols, axis=1)
                ev = jnp.take_along_axis(ev, cols, axis=1)
            loss, top1 = query_loss(
                params, config,
                batch["query_input_ids"], batch["query_attention_mask"],
                sv, ev,
                t, pt, cand_mask=batch["cand_mask"],
                deterministic=False, dropout_rng=rng, attn_impl=attn_impl)
            return loss, top1

        (loss, top1), grads = jax.value_and_grad(loss_fn, has_aux=True)(q_params)
        updates, opt_state = optimizer.update(grads, opt_state, q_params)
        q_params = optax.apply_updates(q_params, updates)
        return q_params, opt_state, loss, top1

    return step


def train_query_encoder(
    model,  # DensePhrases facade (frozen searcher inside)
    qa_pairs: Sequence[Tuple[str, List[str]]],
    cfg: QueryFTConfig,
    batch_size: int = 12,
    dev_pairs: Optional[Sequence[Tuple[str, List[str]]]] = None,
    eval_top_k: int = 10,
    seed: int = 0,
    rng_impl: str = "rbg",
):
    """Driver loop (ref: train_query.py:34-179). Returns (trained query
    params, history).

    `model` provides .query2vec / .mips / .params / .config / .tokenizer;
    the trained towers are written back into model.params at the end and
    whenever dev EM improves (best-ckpt-only parity, train_query.py:166-172).
    """
    from densephrases_tpu.data.features import convert_questions_to_features

    config = model.config
    n_cands = cfg.top_k * 2
    total_steps = max(1, cfg.epochs * (len(qa_pairs) // max(batch_size, 1) + 1))
    optimizer = optax.adamw(
        optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   max(int(total_steps * cfg.warmup_ratio), 1)),
             optax.linear_schedule(cfg.learning_rate, 0.0, total_steps)],
            [max(int(total_steps * cfg.warmup_ratio), 1)]),
        weight_decay=0.01)

    q_params = {
        "query_start": jax.tree.map(jnp.copy, model.params["query_start"]),
        "query_end": jax.tree.map(jnp.copy, model.params["query_end"]),
    }
    frozen_rest = {k: v for k, v in model.params.items()
                   if k not in ("query_start", "query_end")}
    # the frozen searcher towers (refreshed every update_freq epochs)
    searcher_params = jax.tree.map(jnp.copy, model.params)

    opt_state = optimizer.init(q_params)
    step_fn = make_query_train_step(config, optimizer, cfg.label_strat)
    # dropout-mask stream only (TrainOptions.rng_impl: rbg skips threefry
    # VPU bit generation)
    if rng_impl == "threefry":  # jax spells it threefry2x32
        rng_impl = "threefry2x32"
    rng = jax.random.key(seed, impl=rng_impl)
    history = {"loss": [], "top1": [], "dev_em": []}
    best_em = -1.0
    best_q_params = q_params

    questions = [q for q, _ in qa_pairs]
    answers = [a for _, a in qa_pairs]

    for epoch in range(cfg.epochs):
        order = np.random.default_rng(seed + epoch).permutation(len(questions))
        ep_losses, ep_top1 = [], []
        for b0 in range(0, len(order), batch_size):
            idx = order[b0: b0 + batch_size]
            qs = [questions[i] for i in idx]
            golds = [answers[i] for i in idx]

            # --- retrieve with the frozen towers (ref: get_top_phrases).
            # Candidate vectors stay ON DEVICE ([B, 2K, D] straight from the
            # rescore kernel); the host only annotates the small text fields
            # and sends back a [B, C] column gather — on an asymmetric
            # tunnel this saves a ~B·K·D·8-byte round trip per batch.
            model.params = searcher_params
            qvec = model.query2vec(qs)
            results, (sv_dev, ev_dev) = model.mips.search(
                qvec, q_texts=qs, top_k=cfg.top_k, vecs_on_device=True,
                max_answer_length=cfg.max_answer_length)
            cols, t, pt, cm = annotate_candidate_cols(
                results, golds, regex=cfg.regex, n_cands=n_cands)
            if not t.any() and not pt.any():
                continue  # ref skips batches with no targets (encoder.py:377)

            feats = convert_questions_to_features(
                qs, model.tokenizer, model.max_query_length)
            batch = {
                "query_input_ids": jnp.asarray(
                    np.stack([f.input_ids for f in feats])),
                "query_attention_mask": jnp.asarray(
                    np.stack([f.attention_mask for f in feats])),
                "start_vecs": sv_dev, "end_vecs": ev_dev,
                "cand_cols": jnp.asarray(cols),
                "targets": jnp.asarray(t), "p_targets": jnp.asarray(pt),
                "cand_mask": jnp.asarray(cm),
            }
            rng, sub = jax.random.split(rng)
            q_params, opt_state, loss, top1 = step_fn(
                q_params, opt_state, frozen_rest, batch, sub)
            ep_losses.append(float(loss))
            ep_top1.append(float(np.asarray(top1).mean()))

        history["loss"].append(float(np.mean(ep_losses)) if ep_losses else 0.0)
        history["top1"].append(float(np.mean(ep_top1)) if ep_top1 else 0.0)
        logger.info("qsft epoch %d: loss=%.4f top1=%.3f", epoch,
                    history["loss"][-1], history["top1"][-1])

        # --- dev eval with the *trained* towers; keep best
        if dev_pairs is not None:
            model.params = {**frozen_rest, **q_params}
            metrics = model.evaluate(list(dev_pairs), top_k=eval_top_k,
                                     regex=cfg.regex)
            em = metrics["em_top1"]
            history["dev_em"].append(em)
            if em > best_em:
                best_em = em
                best_q_params = jax.tree.map(jnp.copy, q_params)
        else:
            best_q_params = q_params

        # --- refresh frozen searcher towers (ref: train_query.py:174-176)
        if (epoch + 1) % cfg.update_freq == 0:
            searcher_params = {**frozen_rest,
                               **jax.tree.map(jnp.copy, q_params)}

    model.params = {**frozen_rest, **best_q_params}
    return best_q_params, history
