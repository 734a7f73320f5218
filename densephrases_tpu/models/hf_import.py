"""HuggingFace BERT/SpanBERT checkpoint import.

The reference initializes its towers from HF hub checkpoints
(``spanbert-base-cased``, ref: single_utils.py:59-118 with back-compat key
remapping :36-56). This module maps a HF ``BertModel`` state_dict (torch, CPU)
onto our stacked-layer pytree — transposing Linear weights (torch stores
[out, in]) and stacking the per-layer tensors along the leading layer axis
that our ``lax.scan`` forward expects.

Also supports the reference's own published DensePhrases checkpoints
(three towers + filter head) via the same per-tower mapping with the
``bert_start``→phrase_encoder style key remap (ref: single_utils.py:43-47).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from densephrases_tpu.models.bert import BertConfig


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def bert_params_from_state_dict(sd: Dict[str, "object"], config: BertConfig,
                                prefix: str = ""):
    """Map a HF BertModel state_dict → our pytree. `prefix` e.g. 'bert.'."""
    g = lambda k: _to_np(sd[prefix + k])
    n = config.num_hidden_layers

    embed = {
        "word": g("embeddings.word_embeddings.weight"),
        "pos": g("embeddings.position_embeddings.weight"),
        "type": g("embeddings.token_type_embeddings.weight"),
        "ln_scale": g("embeddings.LayerNorm.weight"),
        "ln_bias": g("embeddings.LayerNorm.bias"),
    }

    def layer_key(i, k):
        return f"encoder.layer.{i}.{k}"

    def stack(key, transpose=False):
        mats = []
        for i in range(n):
            w = g(layer_key(i, key))
            mats.append(w.T if transpose else w)
        return np.stack(mats)

    layers = {
        "q_w": stack("attention.self.query.weight", transpose=True),
        "q_b": stack("attention.self.query.bias"),
        "k_w": stack("attention.self.key.weight", transpose=True),
        "k_b": stack("attention.self.key.bias"),
        "v_w": stack("attention.self.value.weight", transpose=True),
        "v_b": stack("attention.self.value.bias"),
        "attn_out_w": stack("attention.output.dense.weight", transpose=True),
        "attn_out_b": stack("attention.output.dense.bias"),
        "attn_ln_scale": stack("attention.output.LayerNorm.weight"),
        "attn_ln_bias": stack("attention.output.LayerNorm.bias"),
        "ffn_in_w": stack("intermediate.dense.weight", transpose=True),
        "ffn_in_b": stack("intermediate.dense.bias"),
        "ffn_out_w": stack("output.dense.weight", transpose=True),
        "ffn_out_b": stack("output.dense.bias"),
        "ffn_ln_scale": stack("output.LayerNorm.weight"),
        "ffn_ln_bias": stack("output.LayerNorm.bias"),
    }
    return {"embed": {k: v.astype(np.float32) for k, v in embed.items()},
            "layers": {k: v.astype(np.float32) for k, v in layers.items()}}


# key remap for the reference's released encoder checkpoints
# (ref: single_utils.py:43-47 backward_compat)
TOWER_PREFIXES = {
    "phrase": ("phrase_encoder.", "bert_start."),
    "query_start": ("query_start_encoder.", "bert_q_start."),
    "query_end": ("query_end_encoder.", "bert_q_end."),
}


def encoder_params_from_state_dict(sd: Dict[str, "object"], config: BertConfig):
    """Map a full DensePhrases Encoder state_dict → our 3-tower pytree."""
    params = {}
    for tower, prefixes in TOWER_PREFIXES.items():
        found = None
        for p in prefixes:
            if any(k.startswith(p) for k in sd):
                # HF BertModel nested under e.g. 'phrase_encoder.' (maybe
                # with a 'bert.' level for SpanBERT-style wrappers)
                inner = p + "bert." if any(
                    k.startswith(p + "bert.") for k in sd) else p
                found = inner
                break
        if found is None:
            raise KeyError(f"no weights for tower {tower} (tried {prefixes})")
        params[tower] = bert_params_from_state_dict(sd, config, prefix=found)
    params["filter"] = {
        "w": _to_np(sd["filter_linear.weight"]).T.astype(np.float32),
        "b": _to_np(sd["filter_linear.bias"]).astype(np.float32),
    }
    return params


def load_encoder_from_torch(path: str, config: BertConfig):
    """Load a torch .bin/.pt checkpoint file into our param pytree."""
    import torch  # CPU-only torch is available in the image

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return encoder_params_from_state_dict(sd, config)
