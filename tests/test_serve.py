"""HTTP serving tests: in-process tornado servers driven over real sockets."""

import json
import socket
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.dump import dump_phrases
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.model import DensePhrases
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.serve.server import make_index_app, make_query_encoder_app


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def served_model(tmp_path_factory):
    docs = [{"doc_id": 0, "title": "Test",
             "paragraphs": ["The capital of France is Paris. "
                            "The Eiffel Tower stands in Paris."]}]
    tok = train_wordpiece_vocab([docs[0]["paragraphs"][0]], vocab_size=400)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    store = dump_phrases(params, cfg, tok, docs,
                         str(tmp_path_factory.mktemp("serve") / "store"),
                         max_seq_length=64, batch_size=2, attn_impl="xla")
    return DensePhrases(params, cfg, tok, MIPS(store), max_query_length=16)


def _serve_in_thread(app, port):
    import tornado.ioloop

    loop_holder = {}

    def run():
        import asyncio

        asyncio.set_event_loop(asyncio.new_event_loop())
        app.listen(port, address="127.0.0.1")
        loop_holder["loop"] = tornado.ioloop.IOLoop.current()
        loop_holder["loop"].start()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(50):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.1)
    return loop_holder


def test_index_server_api(served_model):
    port = _free_port()
    _serve_in_thread(make_index_app(served_model), port)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api?query=where+is+the+eiffel+tower") as r:
        out = json.loads(r.read())
    assert "ret" in out and "answers" in out and "time" in out
    assert isinstance(out["answers"], list)
    # batch endpoint
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/batch_api",
        data=json.dumps({"query": ["capital of france", "eiffel tower"],
                         "top_k": 3}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["answers"]) == 2
    for ret in out["ret"]:
        for hit in ret:
            assert set(hit) >= {"answer", "context", "title", "score"}


def test_query_encoder_server(served_model):
    port = _free_port()
    _serve_in_thread(make_query_encoder_app(served_model), port)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query2vec_api",
        data=json.dumps({"query": ["a question"]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    vec = np.asarray(out["vec"])
    assert vec.shape == (1, 2 * served_model.config.hidden_size)
