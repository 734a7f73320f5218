"""Reading-comprehension training: optimizer, schedule, train step, DP mesh.

TPU-native re-design of the reference RC trainer
(ref: train_rc.py:53-304): AdamW + linear warmup/decay
(ref: train_rc.py:85-98), grad clipping (ref: train_rc.py:245-254), and the
4-part loss from densephrases_tpu.models.encoder. The reference's
DataParallel/DDP + NCCL all_gather (ref: train_rc.py:120-128, encoder.py:
154-193) becomes a ``shard_map`` over a mesh 'dp' axis: the batch is sharded,
in-batch negatives are globally gathered inside the loss via
``jax.lax.all_gather`` (gradients flow through the local shard natively), and
gradients are ``psum``-averaged over ICI.

The whole step — forward, loss, collectives, backward, clip, AdamW, schedule,
pre-batch ring-buffer update — is ONE jitted function.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import (
    RCLossConfig,
    init_pre_batch,
    pre_batch_update,
    rc_loss,
)


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then linear decay to 0 (ref: train_rc.py:96-98
    get_linear_schedule_with_warmup)."""
    warmup_steps = max(warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def make_optimizer(lr: float = 3e-5, warmup_steps: int = 0, total_steps: int = 10000,
                   weight_decay: float = 0.01, adam_epsilon: float = 1e-8,
                   max_grad_norm: float = 1.0):
    """AdamW with no weight decay on biases/LayerNorm
    (ref: train_rc.py:85-94 no_decay grouping)."""
    schedule = linear_warmup_schedule(lr, warmup_steps, total_steps)

    def decay_mask(params):
        def is_decay(path, _):
            name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
            if name == "b" or name.endswith("/b"):  # filter/qa_outputs biases
                return False
            return not any(s in name for s in ("_b", "bias", "ln_", "_ln"))
        return jax.tree_util.tree_map_with_path(is_decay, params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=adam_epsilon,
                    weight_decay=weight_decay, mask=decay_mask),
    )


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    pre_batch: Optional[Any] = None

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.pre_batch), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def create_train_state(params, optimizer, pbn_size: int = 0, batch_size: int = 0,
                       hidden: int = 0) -> TrainState:
    pre_batch = None
    if pbn_size > 0:
        pre_batch = init_pre_batch(pbn_size, batch_size, hidden)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.int32(0), pre_batch=pre_batch)


def make_train_step(config: BertConfig, loss_cfg: RCLossConfig, optimizer,
                    mesh: Optional[Mesh] = None, dp_axis: str = "dp",
                    attn_impl: str = "auto", frozen_word_embeddings: bool = True,
                    remat: str = "full"):
    """Build the jitted train step. With a mesh, the step is shard_mapped over
    ``dp_axis`` (batch sharded, params replicated).

    frozen_word_embeddings: the reference freezes word embeddings during RC
    training (ref: train_rc.py:65-70 requires_grad=False on embeddings).
    """

    def freeze_grads(grads, params):
        new = dict(grads)
        # teacher towers never update (ref: frozen cross-encoder,
        # train_rc.py:65-73; removed before save :546-549)
        for frozen_tree in ("cross", "qa_outputs"):
            if frozen_tree in new:
                new[frozen_tree] = jax.tree.map(jnp.zeros_like,
                                                new[frozen_tree])
        if not frozen_word_embeddings:
            return new

        def zero_embed(g):
            g = dict(g)
            emb = dict(g["embed"])
            emb["word"] = jnp.zeros_like(emb["word"])
            g["embed"] = emb
            return g

        for tower in ("phrase", "query_start", "query_end"):
            if tower in new:
                new[tower] = zero_embed(new[tower])
        return new

    def local_step(state: TrainState, batch, rng):
        if loss_cfg.axis_name is not None:
            # distinct dropout streams per data-parallel shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(loss_cfg.axis_name))

        def loss_fn(params):
            total, aux = rc_loss(
                params, config, batch, loss_cfg, pre_batch=state.pre_batch,
                deterministic=False, dropout_rng=rng, attn_impl=attn_impl,
                remat=remat)
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if loss_cfg.axis_name is not None:
            grads = jax.lax.pmean(grads, loss_cfg.axis_name)
            loss = jax.lax.pmean(loss, loss_cfg.axis_name)
        grads = freeze_grads(grads, state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        # Zero the *updates* too: AdamW weight decay would otherwise still
        # shrink frozen parameters despite their zero gradients.
        updates = freeze_grads(updates, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_pb = state.pre_batch
        if state.pre_batch is not None:
            new_pb = pre_batch_update(state.pre_batch, aux["gold_start"],
                                      aux["gold_end"])
        metrics = {"loss": loss}
        for k in ("single_loss", "neg_loss", "filter_loss", "kl_loss"):
            if k in aux:
                metrics[k] = aux[k]
        return TrainState(new_params, new_opt, state.step + 1, new_pb), metrics

    if mesh is None:
        return jax.jit(local_step)

    from densephrases_tpu.parallel import shard_map_compat

    assert loss_cfg.axis_name == dp_axis, (
        "loss_cfg.axis_name must match the mesh dp axis for global negatives")

    batch_spec = P(dp_axis)
    state_spec = P()  # params/opt replicated

    smapped = shard_map_compat(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
    )
    step_fn = jax.jit(smapped)

    def wrapped(state, batch, rng):
        return step_fn(state, batch, rng)

    return wrapped


def shard_batch(batch, mesh: Mesh, dp_axis: str = "dp"):
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = NamedSharding(mesh, P(dp_axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
