"""North-star acceptance: train → dump → index → search returns the right
answer on the bundled custom-index example (ref:
examples/create-custom-index/README.md:27-99 — 'Kevin Skinner' must come
back; here with a from-scratch tiny encoder overfit on 3 QA pairs)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only

from densephrases_tpu.data.rc_dataset import batches, convert_rc_examples
from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.dump import dump_phrases
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.model import DensePhrases
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import RCLossConfig, init_encoder_params
from densephrases_tpu.train.rc import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

QA = [
    ("who won season 4 of america's got talent", "Kevin Skinner", 0),
    ("who was the host of season 4", "Nick Cannon", 0),
    ("who replaced jerry springer as host", "Nick Cannon", 0),
]


@pytest.mark.slow
def test_trained_model_answers_kevin_skinner(tmp_path):
    arts = json.load(open(
        "/root/reference/examples/create-custom-index/articles.json"))["data"]
    docs = [{"doc_id": i, "title": a["title"],
             "paragraphs": [p["context"] for p in a["paragraphs"][:2]]}
            for i, a in enumerate(arts[:3])]

    examples = []
    for qi, (q, ans, di) in enumerate(QA):
        ctx = next(p for p in docs[di]["paragraphs"] if ans in p)
        examples.append({
            "qid": str(qi), "question": q, "title": docs[di]["title"],
            "context": ctx, "answer_text": ans,
            "answer_start": ctx.index(ans)})

    texts = [p for d in docs for p in d["paragraphs"]]
    tok = train_wordpiece_vocab(texts + [q for q, _, _ in QA],
                                vocab_size=1200)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    feats = convert_rc_examples(examples, tok, max_seq_length=128,
                                doc_stride=64, max_query_length=24)

    opt = make_optimizer(lr=1e-3, warmup_steps=5, total_steps=300)
    state = create_train_state(params, opt)
    step = make_train_step(cfg, RCLossConfig(lambda_neg=1.0, lambda_flt=1.0),
                           opt, attn_impl="xla")
    rng = jax.random.PRNGKey(1)
    batch_list = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batches(feats, 3, shuffle=False, drop_last=False)
    ]
    first = last = None
    for it in range(200):
        for b in batch_list:
            rng, sub = jax.random.split(rng)
            state, m = step(state, b, sub)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last) and last < first * 0.2, (first, last)

    store = dump_phrases(state.params, cfg, tok, docs, str(tmp_path / "s"),
                         max_seq_length=128, batch_size=4, attn_impl="xla")
    dp = DensePhrases(state.params, cfg, tok, MIPS(store), max_query_length=24)

    answers = dp.search(QA[0][0], retrieval_unit="phrase", top_k=3)
    assert any("kevin skinner" in a.lower() for a in answers), answers
    hits = 0
    for q, gold, _ in QA:
        ans = dp.search(q, retrieval_unit="phrase", top_k=3)
        hits += any(gold.lower() in a.lower() or a.lower() in gold.lower()
                    for a in ans)
    assert hits >= 2, hits


def test_sequence_length_guard():
    """Over-length inputs must fail loudly, not NaN silently."""
    cfg = BertConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    from densephrases_tpu.models.bert import bert_forward

    ids = jnp.zeros((1, cfg.max_position_embeddings + 8), jnp.int32)
    with pytest.raises(AssertionError, match="max_position_embeddings"):
        bert_forward(params["phrase"], ids, jnp.ones_like(ids), config=cfg,
                     attn_impl="xla")
