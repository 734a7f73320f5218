"""Query-side fine-tuning driver.

Driver parity: ref train_query.py:278-307 main(): loads encoder + index,
trains the query towers with search-in-the-loop, keeps the best-dev model.

Usage:
  python -m densephrases_tpu.cli.train_query --load_dir enc/ \
      --dump_dir dump/ --train_path nq_train.json --dev_file nq_dev.json \
      --output_dir out/ [--qsft_top_k 100]
"""

from __future__ import annotations

import logging
import os

from densephrases_tpu.cli.common import save_encoder
from densephrases_tpu.cli.eval_phrase_retrieval import load_model
from densephrases_tpu.data.qa import load_qa_pairs
from densephrases_tpu.options import Options
from densephrases_tpu.train.query import QueryFTConfig, train_query_encoder

logger = logging.getLogger(__name__)


def main(argv=None):
    opts = Options().parse(
        argv, groups=["model", "index", "retrieval", "qsft", "data", "train"])
    q, r, d = opts.qsft, opts.retrieval, opts.data

    model = load_model(opts)
    _, questions, answers = load_qa_pairs(
        r.test_path or d.train_file, draft=opts.draft, truecase=model.truecase)
    train_pairs = list(zip(questions, answers))
    dev_pairs = None
    if d.dev_file:
        _, dq, da = load_qa_pairs(d.dev_file, draft=opts.draft,
                                  truecase=model.truecase)
        dev_pairs = list(zip(dq, da))

    cfg = QueryFTConfig(
        top_k=q.qsft_top_k, learning_rate=q.qsft_learning_rate,
        epochs=q.qsft_epochs, regex=r.regex, label_strat=q.label_strat,
        update_freq=q.update_freq,
        max_answer_length=opts.model.max_answer_length)
    best_params, history = train_query_encoder(
        model, train_pairs, cfg,
        batch_size=opts.train.per_device_train_batch_size,
        dev_pairs=dev_pairs, eval_top_k=r.top_k, seed=opts.train.seed,
        rng_impl=opts.train.rng_impl)
    logger.info("history: %s", {k: v for k, v in history.items()})

    if opts.model.output_dir:
        save_encoder(opts.model.output_dir, model.params, model.config,
                     model.tokenizer)
        logger.info("saved query-FT model to %s", opts.model.output_dir)
    return history


if __name__ == "__main__":
    main()
