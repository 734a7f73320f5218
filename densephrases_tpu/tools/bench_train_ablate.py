"""Train-step MFU ablation: where does the non-matmul time go?

Measures the dispatch-amortized RC train step (b24/L384, BERT-base — the
reference's training shape, ref: train_rc.py:196-257) under one-factor
ablations of the suspected VPU/bandwidth sinks:

- dropout OFF (threefry random-bit generation is pure VPU work),
- attention XLA vs Pallas at L=384,
- gelu tanh-approximation vs exact erf (fp32 VPU),
- remat full vs dots.

Each variant reports amortized ms/step and analytic-flops MFU. The point
is ATTRIBUTION: the deltas say which sink to attack, the absolute dots
number is the DEVICE_BENCH headline.

Run: python densephrases_tpu/tools/bench_train_ablate.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

PEAK_TFLOPS = float(os.environ.get("DPH_PEAK_TFLOPS", "197"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "TRAIN_ABLATE.json"))
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny and os.environ.get("JAX_PLATFORMS") == "cpu":
        # the env var alone is ignored once the axon plugin registers;
        # the config update must happen before first backend use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import (
        RCLossConfig,
        init_encoder_params,
        rc_loss,
    )
    from densephrases_tpu.tools.bench_device import repeat_ms, roundtrip_floor
    from densephrases_tpu.train.rc import create_train_state, make_optimizer

    config = BertConfig.tiny(vocab_size=1000) if args.tiny else BertConfig()
    bt, l, lq = (4, 128, 16) if args.tiny else (24, 384, 32)
    res = {"backend": jax.default_backend(), "shape": f"b{bt}/L{l}"}
    floor = roundtrip_floor()
    res["roundtrip_floor_ms"] = round(1000 * floor, 2)

    params = init_encoder_params(jax.random.PRNGKey(0), config)
    opt = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=100)
    state = create_train_state(params, opt, pbn_size=2, batch_size=bt,
                               hidden=config.hidden_size)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 1000, (bt, l)), jnp.int32),
        "attention_mask": jnp.ones((bt, l), jnp.int32),
        "token_type_ids": jnp.zeros((bt, l), jnp.int32),
        "query_input_ids": jnp.asarray(rng.integers(5, 1000, (bt, lq)),
                                       jnp.int32),
        "query_attention_mask": jnp.ones((bt, lq), jnp.int32),
        "query_token_type_ids": jnp.zeros((bt, lq), jnp.int32),
        "start_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)),
                                       jnp.int32),
        "end_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)),
                                     jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    loss_cfg = RCLossConfig(lambda_neg=1.0, lambda_flt=1.0)
    opt_ = opt

    p_enc = 12 * (4 * config.hidden_size ** 2 +
                  2 * config.hidden_size * config.intermediate_size)
    fl_model = 6.0 * p_enc * (bt * l + 2 * bt * lq)
    k_rep = 8

    def build_step(remat, attn_impl, dropout, cfg=None):
        """grad + adamw step, dropout optionally disabled (deterministic)."""
        import optax

        cfg = cfg or config

        def step(st, b_, ky):
            def loss_fn(p):
                total, aux = rc_loss(
                    p, cfg, b_, loss_cfg, pre_batch=st.pre_batch,
                    deterministic=not dropout, dropout_rng=ky,
                    attn_impl=attn_impl, remat=remat)
                return total, aux

            (loss, _aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            updates, new_opt = opt_.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            from densephrases_tpu.train.rc import TrainState

            return TrainState(new_params, new_opt, st.step + 1,
                              st.pre_batch), loss

        @jax.jit
        def rep(st, b_, ky):
            def body(i, carry):
                s_, acc = carry
                s2, ls = step(s_, b_, jax.random.fold_in(ky, i))
                return (s2, acc + ls)
            return jax.lax.fori_loop(0, k_rep, body, (st, jnp.float32(0)))[1]

        return rep

    variants = [
        ("dots_dropout_pallas", dict(remat="dots", attn_impl="auto",
                                     dropout=True)),
        ("dots_nodrop_pallas", dict(remat="dots", attn_impl="auto",
                                    dropout=False)),
        ("dots_dropout_xla", dict(remat="dots", attn_impl="xla",
                                  dropout=True)),
        ("full_dropout_pallas", dict(remat="full", attn_impl="auto",
                                     dropout=True)),
        ("none_dropout_pallas", dict(remat="none", attn_impl="auto",
                                     dropout=True)),
    ]
    for name, kw in variants:
        try:
            rep = build_step(**kw)
            ms = repeat_ms(lambda: rep(state, batch, key), k_rep, floor,
                           n_rep=2)
            res[name] = {"ms": round(ms, 1),
                         "mfu": round(fl_model / (ms / 1000.0)
                                      / (PEAK_TFLOPS * 1e12), 4)}
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(name, res[name], flush=True)
        jax.clear_caches()

    # landed-config variants: gelu_tanh (BertConfig.hidden_act), rbg
    # dropout keys (TrainOptions.rng_impl), and their combination — the
    # train-CLI tuned defaults
    import dataclasses

    cfg_tanh = dataclasses.replace(config, hidden_act="gelu_tanh")
    key_rbg = jax.random.key(0, impl="rbg")
    extra = [
        ("dots_dropout_pallas_gelutanh",
         dict(remat="dots", attn_impl="auto", dropout=True, cfg=cfg_tanh),
         key),
        ("dots_dropout_pallas_rbg",
         dict(remat="dots", attn_impl="auto", dropout=True), key_rbg),
        ("dots_dropout_pallas_tuned",
         dict(remat="dots", attn_impl="auto", dropout=True, cfg=cfg_tanh),
         key_rbg),
    ]
    for name, kw, ky in extra:
        try:
            rep = build_step(**kw)
            ms = repeat_ms(lambda: rep(state, batch, ky), k_rep, floor,
                           n_rep=2)
            res[name] = {"ms": round(ms, 1),
                         "mfu": round(fl_model / (ms / 1000.0)
                                      / (PEAK_TFLOPS * 1e12), 4)}
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(name, res[name], flush=True)
        jax.clear_caches()

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
