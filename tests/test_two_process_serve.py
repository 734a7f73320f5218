"""Two-process serving: index server RPCs the query-encoder server."""

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
from densephrases_tpu.serve.server import (
    RemoteQueryEncoder,
    make_index_app,
    make_query_encoder_app,
)
from tests.test_serve import _free_port, _serve_in_thread

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only


def test_p_serve_uses_remote_encoder(tmp_path):
    docs = [{"doc_id": 0, "title": "T",
             "paragraphs": ["Paris is the capital of France."]}]
    tok = train_wordpiece_vocab(docs[0]["paragraphs"], vocab_size=300)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    store = dump_phrases(params, cfg, tok, docs, str(tmp_path / "s"),
                         max_seq_length=48, batch_size=2, attn_impl="xla")
    model = DensePhrases(params, cfg, tok, MIPS(store), max_query_length=12)

    q_port = _free_port()
    _serve_in_thread(make_query_encoder_app(model), q_port)
    remote = RemoteQueryEncoder("127.0.0.1", q_port)

    # remote encoder returns the same vectors as local
    local = np.asarray(model.query2vec(["capital of france"]))
    viahttp = remote.query2vec(["capital of france"])
    np.testing.assert_allclose(viahttp, local, rtol=1e-5, atol=1e-5)

    p_port = _free_port()
    _serve_in_thread(make_index_app(model, remote_encoder=remote), p_port)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{p_port}/api?query=capital+of+france") as r:
        out = json.loads(r.read())
    assert "answers" in out and isinstance(out["answers"], list)
