"""Serving driver: query-encoder server, index server, or combined demo.

Driver parity: ref run_demo.py:358-425 (run_mode q_serve / p_serve /
single_serve / batch_query / eval_request).

Usage:
  python -m densephrases_tpu.cli.run_demo --demo_mode single_serve \
      --load_dir enc/ --dump_dir dump/ --index_port 10002
  python -m densephrases_tpu.cli.run_demo --demo_mode eval_request \
      --test_path nq.json --index_port 10002
"""

from __future__ import annotations

import logging

from densephrases_tpu.cli.eval_phrase_retrieval import load_model
from densephrases_tpu.data.qa import load_qa_pairs
from densephrases_tpu.options import Options
from densephrases_tpu.serve.server import (
    eval_request,
    make_index_app,
    make_query_encoder_app,
    serve,
)

logger = logging.getLogger(__name__)


def main(argv=None):
    opts = Options().parse(
        argv, groups=["model", "index", "retrieval", "demo", "data"])
    mode = opts.demo.demo_mode

    if mode in ("q_serve", "serve_query"):
        model = load_model(opts)
        serve(make_query_encoder_app(model), opts.demo.query_port)
    elif mode == "p_serve":
        # two-process mode: this process holds the index; query encoding is
        # RPC'd to a q_serve process (ref: run_demo.py:278-316)
        from densephrases_tpu.serve.server import RemoteQueryEncoder

        model = load_model(opts)
        remote = RemoteQueryEncoder("127.0.0.1", opts.demo.query_port)
        serve(make_index_app(model, default_top_k=opts.retrieval.top_k,
                             remote_encoder=remote),
              opts.demo.index_port)
    elif mode in ("single_serve", "serve"):
        model = load_model(opts)
        serve(make_index_app(model, default_top_k=opts.retrieval.top_k),
              opts.demo.index_port)
    elif mode == "serve_bert":
        # single-passage reader service (ref: run_demo.py:151-272)
        from densephrases_tpu.cli.common import load_encoder
        from densephrases_tpu.serve.server import make_reader_app
        from densephrases_tpu.utils.checkpoint import restore_checkpoint
        from densephrases_tpu.train.cross_encoder import init_cross_params
        import jax as _jax

        params, config, tokenizer = load_encoder(opts.model.load_dir,
                                                 draft=opts.draft)
        if "cross" not in params:
            import os as _os

            template = init_cross_params(_jax.random.PRNGKey(0), config)
            params = restore_checkpoint(
                _os.path.join(opts.model.load_dir, "params"), template)
        serve(make_reader_app(params, config, tokenizer),
              opts.demo.index_port)
    elif mode == "eval_request":
        _, questions, answers = load_qa_pairs(opts.retrieval.test_path,
                                              draft=opts.draft)
        metrics = eval_request(
            "127.0.0.1", opts.demo.index_port,
            list(zip(questions, answers)),
            batch_size=opts.retrieval.eval_batch_size,
            top_k=opts.retrieval.top_k)
        logger.info("metrics: EM@1=%.2f qps=%.1f",
                    metrics["em_top1"], metrics["qps"])
        return metrics
    else:
        raise SystemExit(f"unknown demo_mode {mode}")


if __name__ == "__main__":
    main()
