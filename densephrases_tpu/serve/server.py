"""HTTP serving: query-encoder server, index server, combined server.

Parity with the reference's two-process demo architecture
(ref: run_demo.py:44-272): a query-encoder service exposing
``/query2vec_api``, an index service exposing ``/api`` (single query) and
``/batch_api`` (batched), plus a combined single-process mode. Flask is not
in this image, so the servers are tornado-native (tornado is what the
reference uses to wrap Flask anyway, run_demo.py:128-143).

The client helper ``eval_request`` mirrors the reference's benchmark client
(ref: run_demo.py:318-356): batched queries, 5-batch warmup excluded, Q/sec
reported.
"""

from __future__ import annotations

import json
import logging
import time
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not serializable: {type(o)}")


def make_query_encoder_app(model):
    """Query-encoder service: POST /query2vec_api {'query': [str]} →
    {'vec': [[...]]} (ref: run_demo.py:44-68)."""
    import tornado.web

    class Query2Vec(tornado.web.RequestHandler):
        def post(self):
            body = json.loads(self.request.body or b"{}")
            queries = body.get("query", [])
            if isinstance(queries, str):
                queries = [queries]
            vecs = model.query2vec(queries)
            self.write(json.dumps({"vec": vecs.tolist()}))

        def get(self):
            q = self.get_argument("query", "")
            vecs = model.query2vec([q])
            self.write(json.dumps({"vec": vecs.tolist()}))

    return tornado.web.Application([(r"/query2vec_api", Query2Vec)])


class RemoteQueryEncoder:
    """query2vec over HTTP against a q_serve process — the reference's
    two-process split where the index server RPCs the encoder server
    (ref: run_demo.py:278-316 FuturesSession embed_query)."""

    def __init__(self, host: str, port: int):
        self.url = f"http://{host}:{port}/query2vec_api"

    def query2vec(self, queries: List[str]) -> np.ndarray:
        import urllib.request

        req = urllib.request.Request(
            self.url, data=json.dumps({"query": queries}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            return np.asarray(json.loads(resp.read())["vec"], np.float32)


def make_index_app(model, default_top_k: int = 10,
                   examples: Optional[List[str]] = None,
                   remote_encoder: Optional[RemoteQueryEncoder] = None,
                   fused: bool = True):
    """Index service: GET /api?query=...&strat=...; POST /batch_api
    (ref: run_demo.py:70-149). With remote_encoder, query vectors come from
    a separate q_serve process over HTTP (two-process mode). With fused
    (default) and a single-device FlatIndex, phrase queries go through the
    one-dispatch serve path."""
    import tornado.web

    fused_server = None
    if fused and remote_encoder is None:
        try:
            from densephrases_tpu.serve.fused import FusedServer

            fused_server = FusedServer(model)
            logger.info("index app: fused one-dispatch serve path active")
        except AssertionError:
            fused_server = None  # sharded/IVF engine → modular path

    def do_search(queries, top_k, strat, unit):
        if fused_server is not None and unit == "phrase":
            rets_all = fused_server.search(queries, top_k=top_k,
                                           aggregate=True)
            answers = [[r["answer"] for r in ret[:top_k]] for ret in rets_all]
            rets = [ret[:top_k] for ret in rets_all]
        elif remote_encoder is not None:
            qvec = remote_encoder.query2vec(queries)
            search_k = top_k if unit == "phrase" else top_k * 2
            rets_all = model.mips.search(
                qvec, q_texts=queries, top_k=search_k, aggregate=True,
                agg_strat=model.UNIT_TO_STRAT.get(unit, "opt1"),
                return_sent=(unit == "sentence"))
            # Per-unit extraction, mirroring DensePhrases.search
            # (model.py:99-104): phrase → answer span, sentence/paragraph →
            # context, document → title.
            if unit in ("sentence", "paragraph"):
                answers = [[r["context"] for r in ret[:top_k]] for ret in rets_all]
            elif unit == "document":
                answers = [[r["title"][0] for r in ret[:top_k]] for ret in rets_all]
            else:
                answers = [[r["answer"] for r in ret[:top_k]] for ret in rets_all]
            rets = [ret[:top_k] for ret in rets_all]
        else:
            answers, rets = model.search(
                queries, retrieval_unit=unit, top_k=top_k, return_meta=True)
        out = []
        for ans, ret in zip(answers, rets):
            out.append([{
                "answer": r.get("answer", ""), "context": r["context"],
                "title": r["title"], "score": r["score"],
                "start_pos": r.get("start_pos", 0),
                "end_pos": r.get("end_pos", 0),
            } for r in ret])
        return answers, out

    class Api(tornado.web.RequestHandler):
        def get(self):
            t0 = time.time()
            q = self.get_argument("query", "")
            top_k = int(self.get_argument("top_k", str(default_top_k)))
            unit = self.get_argument("retrieval_unit", "phrase")
            answers, rets = do_search([q], top_k, None, unit)
            self.write(json.dumps({
                "ret": rets[0], "answers": answers[0],
                "time": int(1000 * (time.time() - t0)),
            }, default=_json_default))

    class BatchApi(tornado.web.RequestHandler):
        def post(self):
            body = json.loads(self.request.body or b"{}")
            queries = body.get("query", [])
            top_k = int(body.get("top_k", default_top_k))
            unit = body.get("retrieval_unit", "phrase")
            t0 = time.time()
            answers, rets = do_search(queries, top_k, None, unit)
            self.write(json.dumps({
                "ret": rets, "answers": answers,
                "time": int(1000 * (time.time() - t0)),
            }, default=_json_default))

    class GetExamples(tornado.web.RequestHandler):
        def get(self):
            self.write(json.dumps({"examples": examples or []}))

    import os

    static_dir = os.path.join(os.path.dirname(__file__), "static")
    return tornado.web.Application([
        (r"/api", Api), (r"/batch_api", BatchApi),
        (r"/get_examples", GetExamples),
        (r"/(.*)", tornado.web.StaticFileHandler,
         {"path": static_dir, "default_filename": "index.html"}),
    ])


def make_reader_app(cross_params, config, tokenizer, attn_impl: str = "auto"):
    """Single-passage reading service: POST /single_api
    {'question': str|[str], 'passage': str|[str]} → extracted answers
    (ref: run_demo.py:151-272 serve_bert_encoder)."""
    import tornado.web

    from densephrases_tpu.eval.reader import read_passages

    class SingleApi(tornado.web.RequestHandler):
        def post(self):
            body = json.loads(self.request.body or b"{}")
            qs = body.get("question", [])
            ps = body.get("passage", [])
            if isinstance(qs, str):
                qs = [qs]
            if isinstance(ps, str):
                ps = [ps]
            t0 = time.time()
            out = read_passages(cross_params, config, tokenizer, qs, ps,
                                attn_impl=attn_impl)
            self.write(json.dumps({
                "ret": out, "time": int(1000 * (time.time() - t0)),
            }, default=_json_default))

    return tornado.web.Application([(r"/single_api", SingleApi)])


def serve(app, port: int):
    """Blocking serve loop."""
    import tornado.ioloop

    app.listen(port)
    logger.info("serving on :%d", port)
    tornado.ioloop.IOLoop.current().start()


def eval_request(host: str, port: int, qa_pairs, batch_size: int = 64,
                 top_k: int = 10, warmup_batches: int = 5):
    """Benchmark client: EM@1 + Q/sec with warmup excluded
    (ref: run_demo.py:318-356)."""
    import urllib.request

    from densephrases_tpu.eval.retrieval import evaluate_predictions

    questions = [q for q, _ in qa_pairs]
    answers = [a for _, a in qa_pairs]
    url = f"http://{host}:{port}/batch_api"

    def call(batch):
        req = urllib.request.Request(
            url, data=json.dumps({"query": batch, "top_k": top_k}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    preds = []
    n_q, elapsed = 0, 0.0
    for i, b0 in enumerate(range(0, len(questions), batch_size)):
        batch = questions[b0: b0 + batch_size]
        t0 = time.time()
        out = call(batch)
        dt = time.time() - t0
        if i >= warmup_batches:
            n_q += len(batch)
            elapsed += dt
        preds.extend(out["answers"])
    qps = n_q / elapsed if elapsed > 0 else float("nan")
    metrics = evaluate_predictions(preds, answers)
    metrics["qps"] = qps
    logger.info("EM@1 %.2f | %.1f Q/sec", metrics["em_top1"], qps)
    return metrics
