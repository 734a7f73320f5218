"""RC training driver.

Driver parity: ref train_rc.py:434-589 main() + :53-304 train(): loads
encoder + data, runs the jitted dp-mesh train step with checkpointing,
periodic eval, and the filter-threshold sweep (``--do_filter_test``,
ref: train_rc.py:410-431).

Usage:
  python -m densephrases_tpu.cli.train_rc --train_file squad.json \
      --output_dir out/ --lambda_neg 2.0 --lambda_flt 1.0 [--draft]
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.cli.common import ensure_tokenizer, load_encoder, save_encoder
from densephrases_tpu.data.qa import load_rc_examples
from densephrases_tpu.data.rc_dataset import batches, convert_rc_examples
from densephrases_tpu.models.encoder import RCLossConfig, embed_phrase, embed_query
from densephrases_tpu.options import Options
from densephrases_tpu.train.rc import (
    create_train_state,
    make_optimizer,
    make_train_step,
    shard_batch,
)
from densephrases_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

logger = logging.getLogger(__name__)


def filter_test(params, config, feats, thresholds=(-4, -3, -2, -1, 0, 1, 2)):
    """Sweep filter thresholds → keep-rate per threshold
    (ref: train_rc.py:410-431 + Makefile:233-244 filter-test)."""
    from densephrases_tpu.dump import _phrase_forward

    keep_rates = {}
    ids = jnp.asarray(np.stack([f.input_ids for f in feats[:64]]))
    am = jnp.asarray(np.stack([f.attention_mask for f in feats[:64]]))
    tt = jnp.asarray(np.stack([f.token_type_ids for f in feats[:64]]))
    _, fs, fe = _phrase_forward(params, ids, am, tt, config=config,
                                attn_impl="xla")
    fs, fe = np.asarray(fs), np.asarray(fe)
    mask = np.asarray(am) > 0
    for th in thresholds:
        keep = ((fs > th) | (fe > th)) & mask
        keep_rates[th] = float(keep.sum() / mask.sum())
    return keep_rates


def main(argv=None):
    opts = Options().parse(argv, groups=["model", "data", "train"])
    m, d, t = opts.model, opts.data, opts.train

    params, config, tokenizer = load_encoder(m.load_dir, draft=opts.draft,
                                             seed=t.seed)
    if t.hidden_act and t.hidden_act != config.hidden_act:
        import dataclasses

        config = dataclasses.replace(config, hidden_act=t.hidden_act)
        logger.info("training with hidden_act=%s", config.hidden_act)
    examples = load_rc_examples(d.train_file, draft=opts.draft)
    tokenizer = ensure_tokenizer(
        tokenizer, [e["context"] for e in examples[:5000]],
        vocab_size=config.vocab_size,
        save_path=os.path.join(m.output_dir, "vocab.txt") if m.output_dir else None)
    if config.vocab_size < tokenizer.vocab_size:
        raise SystemExit(
            f"config vocab {config.vocab_size} < tokenizer {tokenizer.vocab_size}")

    with_teacher = t.lambda_kl > 0
    if with_teacher:
        # teacher cross-encoder weights join the param tree (ref weight
        # surgery: train_rc.py:508-530 — here it's a dict merge)
        from densephrases_tpu.train.cross_encoder import init_cross_params
        from densephrases_tpu.utils.checkpoint import restore_checkpoint as _restore

        template = init_cross_params(jax.random.PRNGKey(t.seed + 1), config)
        if t.teacher_dir:
            teacher = _restore(os.path.join(t.teacher_dir, "params"), template)
            logger.info("loaded distillation teacher from %s", t.teacher_dir)
        else:
            teacher = template
            logger.warning("lambda_kl>0 but no --teacher_dir: random teacher")
        params = {**params, **teacher}

    feats = convert_rc_examples(
        examples, tokenizer, max_seq_length=m.max_seq_length,
        doc_stride=m.doc_stride, max_query_length=m.max_query_length,
        with_teacher=with_teacher,
        max_cross_length=min(m.max_seq_length + m.max_query_length,
                             config.max_position_embeddings))
    logger.info("converted %d features", len(feats))

    n_dev = len(jax.devices())
    if len(feats) < t.per_device_train_batch_size * n_dev:
        logger.warning(
            "only %d features for %d devices: falling back to single-device",
            len(feats), n_dev)
        n_dev = 1
    batch_size = t.per_device_train_batch_size * n_dev
    if len(feats) < batch_size:
        # tiny/draft datasets: repeat features so at least one full batch
        # exists (drop_last would otherwise silently train nothing)
        reps = (batch_size + len(feats) - 1) // len(feats)
        feats = (feats * reps)[:max(batch_size, len(feats))]
        logger.warning("repeated features to fill one batch (%d)", len(feats))
    steps_per_epoch = max(len(feats) // batch_size, 1)
    total_steps = (t.max_steps if t.max_steps > 0
                   else int(steps_per_epoch * t.num_train_epochs))

    optimizer = make_optimizer(
        lr=t.learning_rate, warmup_steps=t.warmup_steps,
        total_steps=total_steps, weight_decay=t.weight_decay,
        adam_epsilon=t.adam_epsilon, max_grad_norm=t.max_grad_norm)

    mesh = None
    loss_cfg = RCLossConfig(lambda_kl=t.lambda_kl, lambda_neg=t.lambda_neg,
                            lambda_flt=t.lambda_flt)
    if n_dev > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
        loss_cfg.axis_name = "dp"

    state = create_train_state(
        params, optimizer, pbn_size=t.pbn_size,
        batch_size=t.per_device_train_batch_size, hidden=config.hidden_size)
    ckpt_dir = os.path.join(m.output_dir, "ckpt") if m.output_dir else None
    skip_steps = 0
    if ckpt_dir and latest_checkpoint(ckpt_dir):
        state = restore_checkpoint(ckpt_dir, state)
        skip_steps = int(np.asarray(state.step))
        logger.info("resumed at step %d", skip_steps)

    from densephrases_tpu.utils.metrics_log import MetricsLogger

    mlog = MetricsLogger(m.output_dir or None, use_wandb=t.wandb)
    step_fn = make_train_step(config, loss_cfg, optimizer, mesh=mesh,
                              remat=t.remat)
    # dropout-mask stream only (init/sampling stay threefry); rbg trades
    # counter-based reproducibility for ~26 ms/step of threefry VPU work
    rng = jax.random.key(t.seed, impl=t.rng_impl)
    global_step = skip_steps
    for epoch in range(int(np.ceil(t.num_train_epochs))):
        ep_skip = max(0, skip_steps - epoch * steps_per_epoch)
        for batch in batches(feats, batch_size, seed=t.seed + epoch,
                             skip_steps=ep_skip):
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            global_step += 1
            if global_step % max(t.logging_steps, 1) == 0 or opts.verbose:
                logger.info("step %d: loss=%.4f", global_step,
                            float(metrics["loss"]))
                mlog.log(global_step,
                         **{k: float(v) for k, v in metrics.items()})
            if ckpt_dir and global_step % t.save_steps == 0:
                save_checkpoint(ckpt_dir, state, step=global_step)
            if global_step >= total_steps:
                break
        if global_step >= total_steps:
            break

    if m.output_dir:
        # strip the frozen teacher before saving (ref: train_rc.py:546-549)
        save_params = {k: v for k, v in state.params.items()
                       if k not in ("cross", "qa_outputs")}
        save_encoder(m.output_dir, save_params, config, tokenizer)
        if ckpt_dir:
            save_checkpoint(ckpt_dir, state, step=global_step)
        logger.info("saved to %s", m.output_dir)

    # dev-set RC eval (ref: train_rc.py:307-407 evaluate + eval_logger)
    if d.dev_file:
        from densephrases_tpu.data.qa import load_rc_examples as _load
        from densephrases_tpu.eval.rc import evaluate_rc

        dev_examples = _load(d.dev_file, draft=opts.draft)
        metrics = evaluate_rc(
            state.params, config, tokenizer, dev_examples,
            max_seq_length=m.max_seq_length, doc_stride=m.doc_stride,
            max_query_length=m.max_query_length,
            max_answer_length=m.max_answer_length)
        out_dir = m.output_dir or "."
        with open(os.path.join(out_dir, "eval_logger.txt"), "a") as f:
            f.write(f"rc-dev\tEM={metrics['exact_match']:.2f}\t"
                    f"F1={metrics['f1']:.2f}\tstep={global_step}\n")

    rates = filter_test(state.params, config, feats)
    logger.info("filter keep-rates: %s", rates)
    return state, rates


if __name__ == "__main__":
    main()
