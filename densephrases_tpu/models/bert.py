"""Functional BERT tower in pure JAX.

The encoder backbone for all towers (phrase / query-start / query-end /
cross-encoder teacher). Design is TPU-first, not a port:

- Parameters are a flat pytree with all transformer layers **stacked** along a
  leading layer axis; the forward pass runs ``jax.lax.scan`` over layers. One
  traced layer body → fast compiles, and a single sharding annotation covers
  every layer under pjit.
- bfloat16 activations by default; layer norm and softmax accumulate in fp32.
- Attention dispatches to a fused Pallas kernel on TPU
  (densephrases_tpu/models/attention.py).

Functional parity target: HF BertModel forward as used by the reference's
towers (ref: densephrases/encoder.py:92-118 — token-level sequence output,
[CLS] hidden state as the query representation; no pooler needed).
HF checkpoint import lives in densephrases_tpu/models/hf_import.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    pad_token_id: int = 0
    # FFN activation: "gelu" = exact erf in fp32 (HF BertModel parity —
    # required for golden-activation agreement with imported checkpoints);
    # "gelu_tanh" = tanh approximation computed in the compute dtype, the
    # TPU-native training choice (measured +5 MFU points at b24/L384,
    # docs/TRAIN_ABLATE.json; max activation divergence ~3e-3).
    hidden_act: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(vocab_size: int = 512) -> "BertConfig":
        """A tiny config for tests and draft runs."""
        return BertConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
        )


def init_bert_params(rng, config: BertConfig, dtype=jnp.float32):
    """Initialize a BERT parameter pytree (truncated-normal-free, N(0, ir))."""
    h, f, n = config.hidden_size, config.intermediate_size, config.num_hidden_layers
    ir = config.initializer_range
    keys = jax.random.split(rng, 16)

    def nrm(key, shape):
        return (jax.random.normal(key, shape) * ir).astype(dtype)

    embed = {
        "word": nrm(keys[0], (config.vocab_size, h)),
        "pos": nrm(keys[1], (config.max_position_embeddings, h)),
        "type": nrm(keys[2], (config.type_vocab_size, h)),
        "ln_scale": jnp.ones((h,), dtype),
        "ln_bias": jnp.zeros((h,), dtype),
    }
    lk = jax.random.split(keys[3], 8)
    layers = {
        "q_w": nrm(lk[0], (n, h, h)),
        "q_b": jnp.zeros((n, h), dtype),
        "k_w": nrm(lk[1], (n, h, h)),
        "k_b": jnp.zeros((n, h), dtype),
        "v_w": nrm(lk[2], (n, h, h)),
        "v_b": jnp.zeros((n, h), dtype),
        "attn_out_w": nrm(lk[3], (n, h, h)),
        "attn_out_b": jnp.zeros((n, h), dtype),
        "attn_ln_scale": jnp.ones((n, h), dtype),
        "attn_ln_bias": jnp.zeros((n, h), dtype),
        "ffn_in_w": nrm(lk[4], (n, h, f)),
        "ffn_in_b": jnp.zeros((n, f), dtype),
        "ffn_out_w": nrm(lk[5], (n, f, h)),
        "ffn_out_b": jnp.zeros((n, h), dtype),
        "ffn_ln_scale": jnp.ones((n, h), dtype),
        "ffn_ln_bias": jnp.zeros((n, h), dtype),
    }
    return {"embed": embed, "layers": layers}


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dropout(x, rate, rng, deterministic):
    """Inverted dropout from uint8 threshold masks.

    ``jax.random.bernoulli`` draws a full-width f32 uniform per element;
    one uint8 lane per element is 4x less generator work (the dominant
    dropout cost even under rbg keys — see docs/TRAIN_ABLATE.json), and
    the compare + multiply stay in the compute dtype so XLA fuses them
    into the surrounding sublayer. Keep probability is quantized to
    1/256 (exactly compensated in the scale), which is ample for
    dropout rates."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    assert 0.0 < rate < 1.0, f"dropout rate must be in [0, 1): {rate}"
    # clamp so tiny rates still drop ~1/256 and rates near 1 can't reach
    # thr=256 (keep_p=0 → inf scale → NaNs)
    thr = min(max(int(round(rate * 256)), 1), 255)
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    keep_p = (256 - thr) / 256.0
    scale = jnp.asarray(1.0 / keep_p, x.dtype)
    return jnp.where(bits >= thr, x * scale, jnp.zeros((), x.dtype))


def bert_forward(
    params,
    input_ids,
    attention_mask,
    token_type_ids=None,
    *,
    config: BertConfig,
    deterministic: bool = True,
    dropout_rng=None,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
    remat="full",
):
    """Run the tower. Returns the full sequence output [B, L, H] (fp32).

    ``attention_mask``: [B, L], 1 for real tokens. Matches HF BertModel
    semantics (the reference towers consume ``outputs[0]``,
    ref: encoder.py:94-99,104-117).

    remat: backward-pass rematerialization of the scanned layer body —
    - "full" (or True): recompute everything; activation memory O(1 layer),
      the safe default for 3-tower training in one chip's HBM.
    - "dots": jax.checkpoint with the save-dot-outputs policy — matmul
      results are kept, only cheap elementwise work recomputes. ~25% fewer
      training FLOPs than "full" for a few GB of saved activations.
    - "none" (or False): no remat (inference, or small models).
    """
    from densephrases_tpu.models.attention import attention

    b, l = input_ids.shape
    cfg = config
    assert l <= cfg.max_position_embeddings, (
        f"sequence length {l} exceeds max_position_embeddings "
        f"{cfg.max_position_embeddings} (out-of-range position lookups "
        f"would silently produce NaN)")
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    embed = params["embed"]
    positions = jnp.arange(l)[None, :]
    x = (
        jnp.take(embed["word"], input_ids, axis=0)
        + jnp.take(embed["pos"], positions, axis=0)
        + jnp.take(embed["type"], token_type_ids, axis=0)
    )
    x = _layer_norm(x, embed["ln_scale"], embed["ln_bias"], cfg.layer_norm_eps)
    if not deterministic and dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        x = _dropout(x, cfg.hidden_dropout_prob, sub, deterministic)
    x = x.astype(compute_dtype)

    mask = attention_mask.astype(jnp.float32)
    n_layers = cfg.num_hidden_layers
    use_dropout = (not deterministic) and dropout_rng is not None
    if use_dropout:
        layer_rngs = jax.random.split(dropout_rng, n_layers)
    else:
        layer_rngs = jax.random.split(jax.random.PRNGKey(0), n_layers)  # unused

    def layer_body(carry, scanned):
        h_in = carry
        lp, rng = scanned
        nh, hd = cfg.num_attention_heads, cfg.head_dim

        def proj(w, bias):
            return (
                jnp.einsum("bld,dh->blh", h_in, w.astype(compute_dtype))
                + bias.astype(compute_dtype)
            )

        q = proj(lp["q_w"], lp["q_b"]).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        k = proj(lp["k_w"], lp["k_b"]).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        v = proj(lp["v_w"], lp["v_b"]).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        ctx = attention(q, k, v, mask, impl=attn_impl)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        attn_out = (
            jnp.einsum("blh,hd->bld", ctx, lp["attn_out_w"].astype(compute_dtype))
            + lp["attn_out_b"].astype(compute_dtype)
        )
        if use_dropout:
            r1, r2 = jax.random.split(rng)
            attn_out = _dropout(attn_out, cfg.hidden_dropout_prob, r1, False)
        attn_out = _layer_norm(
            h_in + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.layer_norm_eps
        )

        ffn = (
            jnp.einsum("blh,hf->blf", attn_out, lp["ffn_in_w"].astype(compute_dtype))
            + lp["ffn_in_b"].astype(compute_dtype)
        )
        if cfg.hidden_act == "gelu_tanh":
            # tanh approximation, no fp32 round-trip: the erf upcast is
            # pure VPU + bandwidth cost (~20 ms/step at b24/L384)
            ffn = jax.nn.gelu(ffn, approximate=True)
        else:
            ffn = jax.nn.gelu(
                ffn.astype(jnp.float32), approximate=False
            ).astype(compute_dtype)
        ffn = (
            jnp.einsum("blf,fh->blh", ffn, lp["ffn_out_w"].astype(compute_dtype))
            + lp["ffn_out_b"].astype(compute_dtype)
        )
        if use_dropout:
            ffn = _dropout(ffn, cfg.hidden_dropout_prob, r2, False)
        out = _layer_norm(
            attn_out + ffn, lp["ffn_ln_scale"], lp["ffn_ln_bias"], cfg.layer_norm_eps
        )
        return out, None

    if remat in (True, "full"):
        body = jax.checkpoint(layer_body)
    elif remat == "dots":
        body = jax.checkpoint(
            layer_body, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat in (False, "none"):
        body = layer_body
    else:
        raise ValueError(f"unknown remat mode {remat!r}")
    x, _ = jax.lax.scan(body, x, (params["layers"], layer_rngs))
    return x.astype(jnp.float32)
