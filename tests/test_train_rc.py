"""RC trainer tests: loss decreases, DP mesh step runs, parity of
single-device vs sharded gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import RCLossConfig, init_encoder_params
from densephrases_tpu.train.rc import (
    create_train_state,
    make_optimizer,
    make_train_step,
    shard_batch,
)


def _batch(cfg, b, l=24, lq=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(5, cfg.vocab_size, (b, l)).astype(np.int32),
        "attention_mask": np.ones((b, l), np.int32),
        "token_type_ids": np.zeros((b, l), np.int32),
        "query_input_ids": rng.integers(5, cfg.vocab_size, (b, lq)).astype(np.int32),
        "query_attention_mask": np.ones((b, lq), np.int32),
        "query_token_type_ids": np.zeros((b, lq), np.int32),
        "start_positions": rng.integers(1, l - 1, (b,)).astype(np.int32),
        "end_positions": rng.integers(1, l - 1, (b,)).astype(np.int32),
    }


def test_loss_decreases_single_device():
    cfg = BertConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=5e-4, warmup_steps=1, total_steps=30)
    state = create_train_state(params, opt)
    loss_cfg = RCLossConfig(lambda_neg=1.0, lambda_flt=0.5)
    step = make_train_step(cfg, loss_cfg, opt, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg, b=4).items()}
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_dp_mesh_step_runs():
    cfg = BertConfig.tiny()
    n_dev = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), ("dp",))
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-4, warmup_steps=1, total_steps=10)
    per_dev = 2
    state = create_train_state(params, opt, pbn_size=2, batch_size=per_dev,
                               hidden=cfg.hidden_size)
    loss_cfg = RCLossConfig(lambda_neg=1.0, lambda_flt=0.5, axis_name="dp")
    step = make_train_step(cfg, loss_cfg, opt, mesh=mesh, attn_impl="xla")
    batch = shard_batch(_batch(cfg, b=per_dev * n_dev), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.pre_batch["count"]) == 1
    state, metrics2 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2["loss"]))


def test_word_embeddings_frozen():
    cfg = BertConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    state = create_train_state(params, opt)
    step = make_train_step(cfg, RCLossConfig(), opt, attn_impl="xla",
                           frozen_word_embeddings=True)
    before = np.asarray(state.params["phrase"]["embed"]["word"])
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg, b=2).items()}
    # two steps: the first runs at warmup lr=0
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = np.asarray(state.params["phrase"]["embed"]["word"])
    np.testing.assert_array_equal(before, after)
    # but position embeddings did move
    assert not np.array_equal(
        np.asarray(params["phrase"]["embed"]["pos"]),
        np.asarray(state.params["phrase"]["embed"]["pos"]))
