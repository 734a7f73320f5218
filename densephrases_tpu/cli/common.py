"""Shared CLI plumbing: encoder/tokenizer/model loading for the drivers.

Role parity: ref densephrases/utils/single_utils.py:59-118 load_encoder and
open_utils.py:26-101 load_phrase_index/get_query2vec."""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np

from densephrases_tpu.data.tokenization import WordPieceTokenizer, train_wordpiece_vocab
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.options import Options

logger = logging.getLogger(__name__)

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S", level=logging.INFO)


def load_config(load_dir: str) -> BertConfig:
    cfg_path = os.path.join(load_dir, "config.json")
    if os.path.exists(cfg_path):
        raw = json.load(open(cfg_path))
        fields = {k: v for k, v in raw.items() if k in BertConfig.__dataclass_fields__}
        return BertConfig(**fields)
    return BertConfig()


def save_encoder(save_dir: str, params, config: BertConfig,
                 tokenizer: WordPieceTokenizer):
    os.makedirs(save_dir, exist_ok=True)
    from densephrases_tpu.utils.checkpoint import save_checkpoint

    json.dump(config.__dict__, open(os.path.join(save_dir, "config.json"), "w"))
    tokenizer.save_vocab(os.path.join(save_dir, "vocab.txt"))
    save_checkpoint(os.path.join(save_dir, "params"), params, step=0)


def load_encoder(load_dir: str = "", draft: bool = False,
                 seed: int = 42) -> Tuple[dict, BertConfig, WordPieceTokenizer]:
    """Load (params, config, tokenizer) from a save dir, or fresh-init when
    no dir is given (no hub access in this environment)."""
    if load_dir and os.path.isdir(load_dir):
        config = load_config(load_dir)
        tokenizer = WordPieceTokenizer.from_vocab_file(
            os.path.join(load_dir, "vocab.txt"))
        from densephrases_tpu.utils.checkpoint import restore_checkpoint

        template = init_encoder_params(jax.random.PRNGKey(seed), config)
        ckpt_dir = os.path.join(load_dir, "params")
        if os.path.isdir(ckpt_dir):
            params = restore_checkpoint(ckpt_dir, template)
        else:
            # torch checkpoint fallback (HF/DensePhrases released weights)
            from densephrases_tpu.models.hf_import import load_encoder_from_torch

            bin_path = os.path.join(load_dir, "pytorch_model.bin")
            params = load_encoder_from_torch(bin_path, config)
        return params, config, tokenizer
    config = BertConfig.tiny() if draft else BertConfig()
    logger.warning("no load_dir: fresh random init (%s)",
                   "tiny draft config" if draft else "bert-base config")
    tokenizer = None  # caller must train/provide a vocab
    params = init_encoder_params(jax.random.PRNGKey(seed), config)
    return params, config, tokenizer


def ensure_tokenizer(tokenizer, corpus_texts, vocab_size: int = 8000,
                     save_path: Optional[str] = None) -> WordPieceTokenizer:
    if tokenizer is not None:
        return tokenizer
    logger.info("training WordPiece vocab (%d) from corpus", vocab_size)
    return train_wordpiece_vocab(corpus_texts, vocab_size=vocab_size,
                                 save_path=save_path)
