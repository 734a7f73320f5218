"""Masked-LM pretraining: the offline substitute for HF checkpoints.

The reference never trains its encoders from scratch — every tower
initializes from pretrained (Span)BERT pulled off the hub
(ref: densephrases/encoder.py:20-52, utils/single_utils.py:59-118), and
its published EM rides on that initialization. This environment has no
hub access, so the framework provides the capability itself: a BERT
masked-LM pretraining stage over whatever offline text is available
(densephrases_tpu/preprocess/offline_corpus.py harvests it), whose
backbone then initializes all three DensePhrases towers exactly the way
the reference copies SpanBERT into them.

TPU-first mechanics, matching the RC trainer's shape:
- ONE jitted train step; BERT-style corruption (15% of non-special
  tokens; 80% [MASK] / 10% random / 10% kept) is sampled ON DEVICE from
  uint8 random lanes inside the same jit — the single slow host core
  never touches per-token masking.
- MLM head = dense + gelu + layer norm + TIED word-embedding decoder +
  bias (the BERT head; weight tying keeps the head cheap at small
  vocab).
- Sequences are fixed-shape packed chunks (RoBERTa-style document
  packing, no NSP), so every step is the same compiled program.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from densephrases_tpu.models.bert import (
    BertConfig,
    bert_forward,
    init_bert_params,
)

logger = logging.getLogger(__name__)

MASK_RATE = 0.15
N_SPECIAL = 5  # [PAD] [UNK] [CLS] [SEP] [MASK] — never masked, never sampled


def init_mlm_params(rng, config: BertConfig, dtype=jnp.float32):
    """Backbone + MLM head. The decoder weight is TIED to the word
    embedding (BERT's head); only the transform dense/LN and the output
    bias are new parameters."""
    kb, kh = jax.random.split(rng)
    h = config.hidden_size
    ir = config.initializer_range
    return {
        "bert": init_bert_params(kb, config, dtype),
        "mlm": {
            "dense_w": (jax.random.normal(kh, (h, h)) * ir).astype(dtype),
            "dense_b": jnp.zeros((h,), dtype),
            "ln_scale": jnp.ones((h,), dtype),
            "ln_bias": jnp.zeros((h,), dtype),
            "out_bias": jnp.zeros((config.vocab_size,), dtype),
        },
    }


def encoder_params_from_backbone(backbone, config: BertConfig, seed: int = 0):
    """DensePhrases tower init from a pretrained backbone: phrase and both
    query towers start as copies (exactly how the reference seeds them
    from SpanBERT, ref: encoder.py:50-52), filter head fresh."""
    k = jax.random.PRNGKey(seed)
    return {
        "phrase": jax.tree.map(jnp.copy, backbone),
        "query_start": jax.tree.map(jnp.copy, backbone),
        "query_end": jax.tree.map(jnp.copy, backbone),
        "filter": {
            "w": (jax.random.normal(k, (config.hidden_size, 2))
                  * config.initializer_range).astype(jnp.float32),
            "b": jnp.zeros((2,), jnp.float32),
        },
    }


def _layer_norm_f32(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def mlm_loss(params, config: BertConfig, input_ids, attention_mask, rng, *,
             mask_token_id: int, deterministic: bool = False,
             attn_impl: str = "auto", remat="full"):
    """Device-side corruption + forward + masked CE.

    Returns (loss, metrics). Corruption uses two uint8 lanes per token:
    one selects the 15% prediction positions among non-special tokens,
    the other picks 80/10/10 mask/random/keep — all fused into the step.
    """
    b, l = input_ids.shape
    r_pos, r_act, r_tok, r_drop = jax.random.split(rng, 4)
    maskable = (attention_mask > 0) & (input_ids >= N_SPECIAL)

    u_pos = jax.random.bits(r_pos, (b, l), dtype=jnp.uint8)
    is_pred = maskable & (u_pos < int(round(MASK_RATE * 256)))

    u_act = jax.random.bits(r_act, (b, l), dtype=jnp.uint8)
    rand_ids = jax.random.randint(r_tok, (b, l), N_SPECIAL,
                                  config.vocab_size, dtype=input_ids.dtype)
    corrupted = jnp.where(u_act < 204, jnp.asarray(mask_token_id,
                                                   input_ids.dtype),
                          jnp.where(u_act < 230, rand_ids, input_ids))
    corrupted = jnp.where(is_pred, corrupted, input_ids)

    hidden = bert_forward(
        params["bert"], corrupted, attention_mask, config=config,
        deterministic=deterministic,
        dropout_rng=None if deterministic else r_drop,
        attn_impl=attn_impl, remat=remat)

    head = params["mlm"]
    x = hidden.astype(jnp.bfloat16) @ head["dense_w"].astype(jnp.bfloat16)
    x = x + head["dense_b"].astype(jnp.bfloat16)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    x = _layer_norm_f32(x, head["ln_scale"].astype(jnp.float32),
                        head["ln_bias"].astype(jnp.float32),
                        config.layer_norm_eps)
    # tied decoder: [B, L, H] x [V, H]^T (one MXU matmul; fp32 logits)
    logits = jnp.einsum(
        "blh,vh->blv", x.astype(jnp.bfloat16),
        params["bert"]["embed"]["word"].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32) + head["out_bias"]

    logp = jax.nn.log_softmax(logits, axis=-1)
    gold = jnp.take_along_axis(logp, input_ids[..., None], axis=-1)[..., 0]
    w = is_pred.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = -(gold * w).sum() / denom
    acc = ((jnp.argmax(logits, -1) == input_ids) * w).sum() / denom
    return loss, {"loss": loss, "acc": acc, "n_pred": w.sum()}


def make_mlm_optimizer(lr: float, warmup_steps: int, total_steps: int,
                       weight_decay: float = 0.01):
    """AdamW + linear warmup/decay, no decay on LN/bias (the reference's
    RC optimizer recipe, ref: train_rc.py:116-133, reused for MLM)."""
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [max(warmup_steps, 1)])

    def decay_mask(params):
        def no_decay(path):
            last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return ("ln_" in last or last.endswith("_b")
                    or last.endswith("bias"))
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not no_decay(p), params)

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay, mask=decay_mask))


def make_mlm_step(config: BertConfig, opt, *, mask_token_id: int,
                  attn_impl: str = "auto", remat="full"):
    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: mlm_loss(p, config, batch["input_ids"],
                               batch["attention_mask"], rng,
                               mask_token_id=mask_token_id,
                               attn_impl=attn_impl, remat=remat),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def pack_chunks(texts: List[str], tok, seq_len: int) -> np.ndarray:
    """Tokenize + pack documents into fixed [n, seq_len] id rows:
    [CLS] tokens... [SEP], documents separated by [SEP], final partial
    chunk padded. Fixed shapes keep every MLM step one compiled program."""
    ids: List[int] = []
    for t in texts:
        ids.extend(tok.encode_batch_ids([t])[0])
        ids.append(tok.sep_token_id)
    body = seq_len - 2
    n = max((len(ids) + body - 1) // body, 1)
    out = np.full((n, seq_len), tok.pad_token_id, np.int32)
    for i in range(n):
        chunk = ids[i * body:(i + 1) * body]
        out[i, 0] = tok.cls_token_id
        out[i, 1:1 + len(chunk)] = chunk
        out[i, 1 + len(chunk)] = tok.sep_token_id
    return out


def pretrain_mlm(texts: List[str], tok, config: BertConfig, *,
                 steps: int, batch_size: int = 32, seq_len: int = 128,
                 lr: float = 1e-3, seed: int = 0, params=None,
                 attn_impl: str = "auto", remat="full",
                 log_every: int = 100, rng_impl: str = "rbg",
                 holdout_frac: float = 0.0):
    """Run MLM pretraining; returns (params, history).

    params: optional resume pytree from init_mlm_params. holdout_frac
    reserves a chunk fraction for a held-out loss probe (reported in
    history['dev_loss'] at each log point)."""
    chunks = pack_chunks(texts, tok, seq_len)
    rng_data = np.random.default_rng(seed)
    perm = rng_data.permutation(len(chunks))
    n_dev = int(len(chunks) * holdout_frac)
    dev_chunks = chunks[perm[:n_dev]]
    chunks = chunks[perm[n_dev:]]
    logger.info("MLM corpus: %d chunks of %d tokens (%d held out)",
                len(chunks), seq_len, n_dev)
    if params is None:
        params = init_mlm_params(jax.random.PRNGKey(seed), config)
    opt = make_mlm_optimizer(lr, warmup_steps=max(steps // 20, 10),
                             total_steps=steps)
    opt_state = opt.init(params)
    step_fn = make_mlm_step(config, opt, mask_token_id=tok.mask_token_id,
                            attn_impl=attn_impl, remat=remat)
    if rng_impl == "threefry":
        rng_impl = "threefry2x32"
    rng = jax.random.key(seed, impl=rng_impl)

    dev_batch = None
    if n_dev:
        take = min(len(dev_chunks), batch_size * 4)
        dev = dev_chunks[:take]
        dev_batch = {"input_ids": jnp.asarray(dev),
                     "attention_mask": jnp.asarray(
                         (dev != tok.pad_token_id).astype(np.int32))}
        dev_key = jax.random.key(seed + 1, impl=rng_impl)
        dev_loss_fn = jax.jit(lambda p: mlm_loss(
            p, config, dev_batch["input_ids"], dev_batch["attention_mask"],
            dev_key, mask_token_id=tok.mask_token_id, deterministic=True,
            attn_impl=attn_impl, remat="none")[0])

    history = {"loss": [], "acc": [], "dev_loss": []}
    t0 = time.perf_counter()
    n_step = 0
    while n_step < steps:
        order = rng_data.permutation(len(chunks))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            rows = chunks[order[s:s + batch_size]]
            batch = {"input_ids": jnp.asarray(rows),
                     "attention_mask": jnp.asarray(
                         (rows != tok.pad_token_id).astype(np.int32))}
            rng, sub = jax.random.split(rng)
            params, opt_state, m = step_fn(params, opt_state, batch, sub)
            n_step += 1
            if n_step % log_every == 0 or n_step == steps:
                loss = float(m["loss"])
                acc = float(m["acc"])
                history["loss"].append(round(loss, 4))
                history["acc"].append(round(acc, 4))
                if dev_batch is not None:
                    history["dev_loss"].append(
                        round(float(dev_loss_fn(params)), 4))
                logger.info(
                    "mlm step %d/%d loss %.4f acc %.3f%s (%.0fs)",
                    n_step, steps, loss, acc,
                    (f" dev {history['dev_loss'][-1]:.4f}"
                     if dev_batch is not None else ""),
                    time.perf_counter() - t0)
            if n_step >= steps:
                break
        if len(chunks) < batch_size:
            raise ValueError(
                f"corpus too small: {len(chunks)} chunks < batch "
                f"{batch_size}")
    return params, history
