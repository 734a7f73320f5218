"""Three-tower phrase/query encoder + span filter head + training losses.

TPU-native re-design of the reference ``Encoder``
(ref: densephrases/encoder.py:17-429):

- ``embed_phrase``: token-wise start = end = last hidden state of the phrase
  tower (ref: encoder.py:92-99) plus the 2-logit filter head
  (ref: encoder.py:32,137-141).
- ``embed_query``: [CLS] hidden state of two separate query towers
  (ref: encoder.py:101-118).
- ``rc_loss``: the 4-part training objective (ref: encoder.py:262-355):
  1. single-passage CE — the reference computes
     ``CE(dense_logits.mean(2), start)`` where
     ``dense_logits[b,i,j] = s[b,i] + e[b,j]`` (ref: encoder.py:206-209,
     273-278). The mean over j adds a constant per row, so it is *exactly*
     ``CE(start_logits, start)``; we compute that directly.
  2. KL distillation from a cross-encoder teacher (ref: encoder.py:280-321),
     with the token realignment precomputed host-side as a gather map.
  3. in-batch / pre-batch / hard-negative CE (ref: encoder.py:220-257,
     324-335). Cross-device negatives use ``jax.lax.all_gather`` inside the
     loss under ``shard_map`` — gradients flow through the local shard
     natively, replacing the reference's all_gather + local-tensor
     substitution trick (ref: encoder.py:154-193).
  4. filter BCE with pos_weight = sequence length (ref: encoder.py:337-355).
- ``query_loss``: query-side fine-tuning MML objective
  (ref: encoder.py:369-429) with targets as boolean masks (static shapes).

The pre-batch negative queue (ref: encoder.py:54-56,357-364) is carried
explicitly in the train state as a fixed-size ring buffer — no Python deque —
so the whole train step stays inside one jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from densephrases_tpu.models.bert import BertConfig, bert_forward, init_bert_params

NEG_INF = -1e9
MIN_PROB = 1e-7


def init_encoder_params(rng, config: BertConfig, dtype=jnp.float32, with_teacher: bool = False):
    """Init all towers. Query towers start as copies of the phrase tower
    (ref: encoder.py:50-52 deepcopy)."""
    k1, k2 = jax.random.split(rng)
    phrase = init_bert_params(k1, config, dtype)
    params = {
        "phrase": phrase,
        "query_start": jax.tree.map(jnp.copy, phrase),
        "query_end": jax.tree.map(jnp.copy, phrase),
        "filter": {
            "w": (jax.random.normal(k2, (config.hidden_size, 2)) * config.initializer_range).astype(dtype),
            "b": jnp.zeros((2,), dtype),
        },
    }
    if with_teacher:
        k3, k4 = jax.random.split(k2)
        params["cross"] = init_bert_params(k3, config, dtype)
        params["qa_outputs"] = {
            "w": (jax.random.normal(k4, (config.hidden_size, 2)) * config.initializer_range).astype(dtype),
            "b": jnp.zeros((2,), dtype),
        }
    return params


def embed_phrase(params, config: BertConfig, input_ids, attention_mask, token_type_ids=None,
                 deterministic=True, dropout_rng=None, attn_impl="auto",
                 remat="full"):
    """Phrase-side reps. Returns (start, end, filter_start_logits, filter_end_logits).

    start and end share the same hidden states (ref: encoder.py:92-99).
    """
    hidden = bert_forward(
        params["phrase"], input_ids, attention_mask, token_type_ids,
        config=config, deterministic=deterministic, dropout_rng=dropout_rng,
        attn_impl=attn_impl, remat=remat,
    )
    flt = jnp.einsum("blh,ho->blo", hidden, params["filter"]["w"].astype(hidden.dtype)) + params["filter"]["b"]
    return hidden, hidden, flt[..., 0], flt[..., 1]


def embed_query(params, config: BertConfig, input_ids, attention_mask, token_type_ids=None,
                deterministic=True, dropout_rng=None, attn_impl="auto",
                remat="full"):
    """Query reps: [CLS] of the two query towers (ref: encoder.py:101-118).

    The two towers share every shape, so they run as ONE vmapped forward
    over stacked parameters: each per-layer matmul becomes a single batched
    GEMM of twice the work instead of two half-size dispatches — better MXU
    occupancy at serving batch sizes and half the kernel launches.

    Returns (query_start [B, H], query_end [B, H]).
    """
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                           params["query_start"], params["query_end"])
    if dropout_rng is not None:
        rngs = jax.random.split(dropout_rng)
        h = jax.vmap(
            lambda p, r: bert_forward(
                p, input_ids, attention_mask, token_type_ids, config=config,
                deterministic=deterministic, dropout_rng=r,
                attn_impl=attn_impl, remat=remat)
        )(stacked, rngs)
    else:
        h = jax.vmap(
            lambda p: bert_forward(
                p, input_ids, attention_mask, token_type_ids, config=config,
                deterministic=deterministic, dropout_rng=None,
                attn_impl=attn_impl, remat=remat)
        )(stacked)
    return h[0][:, 0, :], h[1][:, 0, :]


def _masked_ce(logits, labels, valid):
    """CE with per-example validity mask; mean over valid examples."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].clip(0), axis=-1)[:, 0]
    losses = -picked * valid
    return losses.sum() / jnp.maximum(valid.sum(), 1.0)


@dataclass
class RCLossConfig:
    lambda_kl: float = 0.0
    lambda_neg: float = 0.0
    lambda_flt: float = 0.0
    axis_name: Optional[str] = None  # mesh axis for cross-device negatives


def rc_loss(params, config: BertConfig, batch, loss_cfg: RCLossConfig,
            pre_batch=None, deterministic=False, dropout_rng=None, attn_impl="auto",
            remat="full"):
    """Full RC training objective.

    batch keys: input_ids/attention_mask/token_type_ids (passage, [B, L]),
    query_input_ids/query_attention_mask/query_token_type_ids ([B, Lq]),
    start_positions/end_positions ([B], -1-free; L means "ignored"),
    optional neg_* (hard negative passages), optional teacher fields
    (teacher_gather [B, L] map into cross-encoder positions, -1 = masked;
    cross_* merged inputs).

    pre_batch: optional dict with 'start' [P, B, H], 'end' [P, B, H],
    'count' scalar — the ring buffer of previous gold reps.

    Returns (total_loss, aux) where aux carries per-part losses and the new
    gold reps for the pre-batch queue.
    """
    if dropout_rng is not None:
        rp, rq, rn = jax.random.split(dropout_rng, 3)
    else:
        rp = rq = rn = None

    start, end, f_start, f_end = embed_phrase(
        params, config, batch["input_ids"], batch["attention_mask"],
        batch.get("token_type_ids"), deterministic, rp, attn_impl, remat)
    query_start, query_end = embed_query(
        params, config, batch["query_input_ids"], batch["query_attention_mask"],
        batch.get("query_token_type_ids"), deterministic, rq, attn_impl, remat)

    b, l, h = start.shape
    start_positions = batch["start_positions"]
    end_positions = batch["end_positions"]
    ignored_index = l
    start_positions = jnp.clip(start_positions, 0, ignored_index)
    end_positions = jnp.clip(end_positions, 0, ignored_index)

    # Dense logits (ref: encoder.py:206-209).
    start_logits = jnp.einsum("blh,bh->bl", start, query_start)
    end_logits = jnp.einsum("blh,bh->bl", end, query_end)

    # 1) Single-passage loss == CE on start/end logits directly (see module doc).
    valid_s = (start_positions < ignored_index).astype(jnp.float32)
    valid_e = (end_positions < ignored_index).astype(jnp.float32)
    single_loss = 0.5 * (
        _masked_ce(start_logits, start_positions, valid_s)
        + _masked_ce(end_logits, end_positions, valid_e)
    )
    total = single_loss
    aux = {"single_loss": single_loss}

    # 2) KL distillation (ref: encoder.py:280-321). Teacher runs without grad.
    if loss_cfg.lambda_kl > 0 and "cross_input_ids" in batch:
        teacher_hidden = jax.lax.stop_gradient(bert_forward(
            params["cross"], batch["cross_input_ids"], batch["cross_attention_mask"],
            batch.get("cross_token_type_ids"), config=config, deterministic=True,
            attn_impl=attn_impl))
        qa = params["qa_outputs"]
        t_logits = jnp.einsum("blh,ho->blo", teacher_hidden, qa["w"].astype(teacher_hidden.dtype)) + qa["b"]
        # Realign teacher positions to student passage positions via the
        # host-precomputed gather map (-1 → masked; ref: encoder.py:294-303).
        gmap = batch["teacher_gather"]  # [B, L]
        gclip = jnp.clip(gmap, 0)
        ts = jnp.take_along_axis(t_logits[..., 0], gclip, axis=1)
        te = jnp.take_along_axis(t_logits[..., 1], gclip, axis=1)
        tmask = (gmap >= 0)
        ts = jnp.where(tmask, ts, -1e4)
        te = jnp.where(tmask, te, -1e4)
        tgt_s = jax.nn.softmax(ts.astype(jnp.float32), axis=1)
        tgt_e = jax.nn.softmax(te.astype(jnp.float32), axis=1)
        logp_s = jax.nn.log_softmax(start_logits.astype(jnp.float32), axis=1)
        logp_e = jax.nn.log_softmax(end_logits.astype(jnp.float32), axis=1)
        kl_s = (tgt_s * (jnp.log(jnp.clip(tgt_s, MIN_PROB)) - logp_s)).sum(1).mean()
        kl_e = (tgt_e * (jnp.log(jnp.clip(tgt_e, MIN_PROB)) - logp_e)).sum(1).mean()
        kl_loss = 0.5 * (kl_s + kl_e)
        total = total + loss_cfg.lambda_kl * kl_loss
        aux["kl_loss"] = kl_loss

    # Gold phrase reps for negatives + queue (ref: encoder.py:236-243).
    gold_pos_s = jnp.where(start_positions > 0, start_positions, 0).clip(0, l - 1)
    gold_pos_e = jnp.where(end_positions > 0, end_positions, 0).clip(0, l - 1)
    gold_start = jnp.take_along_axis(start, gold_pos_s[:, None, None].repeat(h, -1), axis=1)[:, 0]
    gold_end = jnp.take_along_axis(end, gold_pos_e[:, None, None].repeat(h, -1), axis=1)[:, 0]
    aux["gold_start"] = gold_start
    aux["gold_end"] = gold_end

    # 3) In-batch / pre-batch / hard negatives (ref: encoder.py:220-257,324-335).
    if loss_cfg.lambda_neg > 0:
        if loss_cfg.axis_name is not None:
            # Cross-device global batch: gather golds & queries from all shards.
            all_gold_start = jax.lax.all_gather(gold_start, loss_cfg.axis_name, tiled=True)
            all_gold_end = jax.lax.all_gather(gold_end, loss_cfg.axis_name, tiled=True)
            my_idx = jax.lax.axis_index(loss_cfg.axis_name)
            label_offset = my_idx * b
        else:
            all_gold_start, all_gold_end = gold_start, gold_end
            label_offset = 0

        inb_start_logits = query_start @ all_gold_start.T  # [B, B*n_shards]
        inb_end_logits = query_end @ all_gold_end.T

        if "neg_input_ids" in batch:
            neg_start, neg_end, _, _ = embed_phrase(
                params, config, batch["neg_input_ids"], batch["neg_attention_mask"],
                batch.get("neg_token_type_ids"), deterministic, rn, attn_impl,
                remat)
            if loss_cfg.axis_name is not None:
                neg_start = jax.lax.all_gather(neg_start, loss_cfg.axis_name, tiled=True)
                neg_end = jax.lax.all_gather(neg_end, loss_cfg.axis_name, tiled=True)
            # Dynamic max over tokens per negative passage (ref: encoder.py:212-218).
            neg_s_logits = jnp.einsum("bh,nlh->bnl", query_start, neg_start).max(-1)
            neg_e_logits = jnp.einsum("bh,nlh->bnl", query_end, neg_end).max(-1)
            inb_start_logits = jnp.concatenate([inb_start_logits, neg_s_logits], axis=1)
            inb_end_logits = jnp.concatenate([inb_end_logits, neg_e_logits], axis=1)

        if pre_batch is not None and pre_batch["start"].shape[0] > 0:
            p, pb, _ = pre_batch["start"].shape
            pre_s = pre_batch["start"].reshape(p * pb, h)
            pre_e = pre_batch["end"].reshape(p * pb, h)
            slot_valid = (jnp.arange(p) < pre_batch["count"])[:, None].repeat(pb, 1).reshape(-1)
            pinb_s = jnp.where(slot_valid[None, :], query_start @ pre_s.T, NEG_INF)
            pinb_e = jnp.where(slot_valid[None, :], query_end @ pre_e.T, NEG_INF)
            inb_start_logits = jnp.concatenate([inb_start_logits, pinb_s], axis=1)
            inb_end_logits = jnp.concatenate([inb_end_logits, pinb_e], axis=1)

        labels = jnp.arange(b) + label_offset
        ones = jnp.ones((b,), jnp.float32)
        neg_loss = 0.5 * (
            _masked_ce(inb_start_logits, labels, ones)
            + _masked_ce(inb_end_logits, labels, ones)
        )
        total = total + loss_cfg.lambda_neg * neg_loss
        aux["neg_loss"] = neg_loss

    # 4) Filter loss (ref: encoder.py:337-355).
    if loss_cfg.lambda_flt > 0:
        pos_weight = jnp.float32(l)
        s1h = jax.nn.one_hot(jnp.where(valid_s > 0, start_positions, -1), l)
        e1h = jax.nn.one_hot(jnp.where(valid_e > 0, end_positions, -1), l)

        def bce(logits, tgt):
            zf = logits.astype(jnp.float32)
            # weighted BCE-with-logits: pos_weight on the positive term
            log_sig = jax.nn.log_sigmoid(zf)
            log_1m = jax.nn.log_sigmoid(-zf)
            return (-(pos_weight * tgt * log_sig + (1.0 - tgt) * log_1m)).mean(1)

        flt = 0.5 * bce(f_start, s1h) + 0.5 * bce(f_end, e1h)
        ans_mask = (batch["start_positions"] > 0).astype(jnp.float32)
        flt_loss = (flt * ans_mask).sum() / (ans_mask.sum() + 1e-9)
        total = total + loss_cfg.lambda_flt * flt_loss
        aux["filter_loss"] = flt_loss

    aux["start_logits"] = start_logits
    aux["end_logits"] = end_logits
    aux["filter_start_logits"] = f_start
    aux["filter_end_logits"] = f_end
    return total, aux


def pre_batch_update(pre_batch, gold_start, gold_end):
    """Push this step's gold reps into the fixed-size ring buffer
    (ref: encoder.py:357-364 deque append)."""
    p = pre_batch["start"].shape[0]
    idx = pre_batch["count"] % p
    new_start = pre_batch["start"].at[idx].set(gold_start)
    new_end = pre_batch["end"].at[idx].set(gold_end)
    return {"start": new_start, "end": new_end, "count": pre_batch["count"] + 1}


def init_pre_batch(pbn_size: int, batch_size: int, hidden: int):
    return {
        "start": jnp.zeros((pbn_size, batch_size, hidden), jnp.float32),
        "end": jnp.zeros((pbn_size, batch_size, hidden), jnp.float32),
        "count": jnp.int32(0),
    }


def _mml(logits, target_mask):
    """-log(sum of softmax probs at targets), clamped (ref: encoder.py:391-407)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = (probs * target_mask).sum(-1)
    return -jnp.log(jnp.clip(p, MIN_PROB, 1.0))


def query_loss(params, config: BertConfig, query_input_ids, query_attention_mask,
               start_vecs, end_vecs, targets, p_targets, cand_mask=None,
               query_token_type_ids=None, deterministic=False, dropout_rng=None,
               attn_impl="auto"):
    """Query-side fine-tuning objective (ref: encoder.py:369-429).

    start_vecs/end_vecs: [B, C, H] frozen phrase vectors from the index.
    targets/p_targets: [B, C] boolean masks (phrase-level / doc-level gold).
    cand_mask: [B, C] False for padded/dummy candidates (zero-score them out).

    Returns (loss, top1_acc [B] bool).
    """
    query_start, query_end = embed_query(
        params, config, query_input_ids, query_attention_mask,
        query_token_type_ids, deterministic, dropout_rng, attn_impl)

    start_logits = jnp.einsum("bh,bch->bc", query_start, start_vecs)
    end_logits = jnp.einsum("bh,bch->bc", query_end, end_vecs)
    if cand_mask is not None:
        neg = jnp.float32(NEG_INF)
        start_logits = jnp.where(cand_mask, start_logits, neg)
        end_logits = jnp.where(cand_mask, end_logits, neg)
    logits = start_logits + end_logits

    targets = targets.astype(jnp.float32)
    p_targets = p_targets.astype(jnp.float32)
    has_t = targets.sum(-1) > 0  # [B]
    has_pt = p_targets.sum(-1) > 0

    def masked_mean(x, m):
        mf = m.astype(jnp.float32)
        return (x * mf).sum() / jnp.maximum(mf.sum(), 1.0)

    loss = 0.0
    # L_phrase: joint + start-only + end-only MML (ref: encoder.py:391-407).
    loss_joint = masked_mean(_mml(logits, targets), has_t)
    loss_s = masked_mean(_mml(start_logits, targets), has_t)
    loss_e = masked_mean(_mml(end_logits, targets), has_t)
    any_t = has_t.any().astype(jnp.float32)
    loss = loss + any_t * (loss_joint + loss_s + loss_e)

    # L_doc: doc-level MML with phrase-target logits suppressed
    # (ref: encoder.py:409-425).
    sup = jnp.where(targets > 0, NEG_INF, 0.0)
    p_loss_s = masked_mean(_mml(start_logits + sup, p_targets), has_pt)
    p_loss_e = masked_mean(_mml(end_logits + sup, p_targets), has_pt)
    any_pt = has_pt.any().astype(jnp.float32)
    loss = loss + any_pt * (p_loss_s + p_loss_e)

    top1 = jnp.take_along_axis(targets, jnp.argmax(logits, -1)[:, None], axis=1)[:, 0] > 0
    return loss, top1


class PhraseEncoder:
    """Stateful convenience wrapper over the pure encoder functions.

    Holds (config, params) and mirrors the reference ``Encoder`` surface
    (ref: encoder.py:17-118). All heavy compute goes through the module-level
    pure functions so everything jits/shards cleanly.
    """

    def __init__(self, config: BertConfig, params=None, rng=None, with_teacher=False):
        self.config = config
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = init_encoder_params(rng, config, with_teacher=with_teacher)
        self.params = params

    def embed_phrase(self, input_ids, attention_mask, token_type_ids=None, **kw):
        return embed_phrase(self.params, self.config, input_ids, attention_mask,
                            token_type_ids, **kw)

    def embed_query(self, input_ids, attention_mask, token_type_ids=None, **kw):
        return embed_query(self.params, self.config, input_ids, attention_mask,
                           token_type_ids, **kw)
