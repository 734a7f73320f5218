"""Cross-encoder (teacher) training driver.

Driver parity: ref train_cross_encoder.py main flow — SQuAD fine-tuning of
the teacher whose weights feed RC distillation (train_rc --lambda_kl).

Usage:
  python -m densephrases_tpu.cli.train_cross_encoder \
      --train_file squad.json --output_dir teacher/ [--draft]
"""

from __future__ import annotations

import logging
import os

import jax

from densephrases_tpu.cli.common import ensure_tokenizer, load_encoder
from densephrases_tpu.data.qa import load_rc_examples
from densephrases_tpu.data.rc_dataset import convert_rc_examples
from densephrases_tpu.options import Options
from densephrases_tpu.train.cross_encoder import train_cross_encoder
from densephrases_tpu.utils.checkpoint import save_checkpoint

logger = logging.getLogger(__name__)


def main(argv=None):
    opts = Options().parse(argv, groups=["model", "data", "train"])
    m, d, t = opts.model, opts.data, opts.train

    params, config, tokenizer = load_encoder(m.load_dir, draft=opts.draft,
                                             seed=t.seed)
    examples = load_rc_examples(d.train_file, draft=opts.draft)
    tokenizer = ensure_tokenizer(
        tokenizer, [e["context"] for e in examples[:5000]],
        vocab_size=config.vocab_size,
        save_path=os.path.join(m.output_dir, "vocab.txt") if m.output_dir else None)

    feats = convert_rc_examples(
        examples, tokenizer, max_seq_length=m.max_seq_length,
        doc_stride=m.doc_stride, max_query_length=m.max_query_length,
        with_teacher=True,
        max_cross_length=min(m.max_seq_length + m.max_query_length,
                             config.max_position_embeddings))
    logger.info("training teacher on %d features", len(feats))

    cross_params, losses = train_cross_encoder(
        config, feats, epochs=int(t.num_train_epochs),
        batch_size=t.per_device_train_batch_size, lr=t.learning_rate,
        seed=t.seed, rng_impl=t.rng_impl)

    if m.output_dir:
        import json

        os.makedirs(m.output_dir, exist_ok=True)
        json.dump(config.__dict__,
                  open(os.path.join(m.output_dir, "config.json"), "w"))
        tokenizer.save_vocab(os.path.join(m.output_dir, "vocab.txt"))
        save_checkpoint(os.path.join(m.output_dir, "params"), cross_params,
                        step=0)
        logger.info("teacher saved to %s", m.output_dir)
    return cross_params, losses


if __name__ == "__main__":
    main()
