"""Cross-encoder (distillation teacher) training.

Parity with ref: train_cross_encoder.py (standard SQuAD fine-tuning of a
single BERT over merged question+passage with a 2-logit QA head; the trained
weights later load as the frozen teacher for RC distillation,
ref: train_rc.py:508-530). Here the teacher is the ``cross`` tower +
``qa_outputs`` head of the same param pytree the student uses, so weight
surgery at distillation time is a dict merge, not key remapping.

Inputs reuse the RC collation's merged cross-encoder features
(data/rc_dataset.py _add_cross_inputs); answer positions are mapped into
cross coordinates via the teacher_gather map.
"""

from __future__ import annotations

import logging
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from densephrases_tpu.models.bert import BertConfig, bert_forward, init_bert_params

logger = logging.getLogger(__name__)


def init_cross_params(rng, config: BertConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "cross": init_bert_params(k1, config),
        "qa_outputs": {
            "w": (jax.random.normal(k2, (config.hidden_size, 2))
                  * config.initializer_range).astype(jnp.float32),
            "b": jnp.zeros((2,), jnp.float32),
        },
    }


def cross_positions(batch) -> tuple:
    """Map passage-coordinate answer positions into cross coordinates using
    teacher_gather (host-side, before device put)."""
    g = batch["teacher_gather"]  # [B, L]
    sp = batch["start_positions"]
    ep = batch["end_positions"]
    b = len(sp)
    cs = np.zeros(b, np.int32)
    ce = np.zeros(b, np.int32)
    for i in range(b):
        cs[i] = g[i, sp[i]] if sp[i] < g.shape[1] and g[i, sp[i]] >= 0 else 0
        ce[i] = g[i, ep[i]] if ep[i] < g.shape[1] and g[i, ep[i]] >= 0 else 0
    return cs, ce


def make_cross_train_step(config: BertConfig, optimizer, attn_impl="auto"):
    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            hidden = bert_forward(
                p["cross"], batch["cross_input_ids"],
                batch["cross_attention_mask"], batch["cross_token_type_ids"],
                config=config, deterministic=False, dropout_rng=rng,
                attn_impl=attn_impl)
            logits = jnp.einsum("blh,ho->blo", hidden,
                                p["qa_outputs"]["w"]) + p["qa_outputs"]["b"]
            s_logits = logits[..., 0]
            e_logits = logits[..., 1]
            mask = batch["cross_attention_mask"].astype(jnp.float32)
            neg = (1.0 - mask) * -1e9
            s_logp = jax.nn.log_softmax(s_logits + neg, axis=-1)
            e_logp = jax.nn.log_softmax(e_logits + neg, axis=-1)
            sp = batch["cross_start_positions"]
            ep = batch["cross_end_positions"]
            loss = -(jnp.take_along_axis(s_logp, sp[:, None], 1)[:, 0]
                     + jnp.take_along_axis(e_logp, ep[:, None], 1)[:, 0]).mean() / 2
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_cross_encoder(config: BertConfig, feats, epochs: int = 2,
                        batch_size: int = 8, lr: float = 3e-5, seed: int = 0,
                        attn_impl: str = "auto", params=None,
                        rng_impl: str = "rbg"):
    """feats: RCFeature list built with with_teacher=True."""
    from densephrases_tpu.data.rc_dataset import batches

    if params is None:
        params = init_cross_params(jax.random.PRNGKey(seed), config)
    # dropout-mask stream only; init stays threefry
    if rng_impl == "threefry":  # jax spells it threefry2x32
        rng_impl = "threefry2x32"
    rng = jax.random.key(seed, impl=rng_impl)
    steps = max(1, epochs * (len(feats) // batch_size))
    optimizer = optax.adamw(
        optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(steps // 10, 1)),
             optax.linear_schedule(lr, 0.0, steps)], [max(steps // 10, 1)]),
        weight_decay=0.01)
    opt_state = optimizer.init(params)
    step_fn = make_cross_train_step(config, optimizer, attn_impl)

    losses = []
    for epoch in range(epochs):
        for batch in batches(feats, batch_size, seed=seed + epoch):
            cs, ce = cross_positions(batch)
            dev_batch = {
                "cross_input_ids": jnp.asarray(batch["cross_input_ids"]),
                "cross_attention_mask": jnp.asarray(batch["cross_attention_mask"]),
                "cross_token_type_ids": jnp.asarray(batch["cross_token_type_ids"]),
                "cross_start_positions": jnp.asarray(cs),
                "cross_end_positions": jnp.asarray(ce),
            }
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step_fn(params, opt_state, dev_batch, sub)
            losses.append(float(loss))
        logger.info("cross-encoder epoch %d: loss=%.4f", epoch,
                    float(np.mean(losses[-10:])))
    return params, losses
