"""Query-side fine-tuning end-to-end: retrieval in the loop must improve
top-1 target retrieval on a controllable synthetic task."""

import jax
import numpy as np
import pytest

from densephrases_tpu.data.tokenization import train_wordpiece_vocab
from densephrases_tpu.dump import dump_phrases
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.model import DensePhrases
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import init_encoder_params
from densephrases_tpu.train.query import (
    QueryFTConfig,
    annotate_candidates,
    train_query_encoder,
)


@pytest.fixture(scope="module")
def qft_setup(tmp_path_factory):
    # corpus whose phrases are the answer strings themselves
    docs = []
    facts = [
        ("alpha", "the secret word is alpha and nothing else matters here"),
        ("bravo", "everyone knows bravo is the codeword of this document"),
        ("charlie", "charlie appears in this text as the hidden answer"),
        ("delta", "the delta token hides within this entire paragraph"),
    ]
    for i, (ans, text) in enumerate(facts):
        docs.append({"doc_id": i, "title": f"doc-{ans}", "paragraphs": [text]})
    tok = train_wordpiece_vocab([t for _, t in facts] +
                                ["find word question" ], vocab_size=500)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    store = dump_phrases(params, cfg, tok, docs,
                         str(tmp_path_factory.mktemp("qft") / "store"),
                         max_seq_length=64, batch_size=4, attn_impl="xla")
    model = DensePhrases(params, cfg, tok, MIPS(store), max_query_length=16)
    qa = [(f"find the word {a}", [a]) for a, _ in facts]
    return model, qa


def test_annotate_candidates(qft_setup):
    model, qa = qft_setup
    qs = [q for q, _ in qa]
    golds = [a for _, a in qa]
    qvec = model.query2vec(qs)
    results = model.mips.search(qvec, top_k=10, return_idxs=True,
                                max_answer_length=5)
    sv, ev, t, pt, cm = annotate_candidates(results, golds, n_cands=20)
    assert sv.shape == (4, 20, model.config.hidden_size)
    assert cm.any(), "no candidates returned"
    # title-free doc targets: answer-in-context marks p_targets
    assert pt.sum() >= t.sum()


def test_query_ft_improves_retrieval(qft_setup):
    model, qa = qft_setup
    before = model.evaluate(qa, top_k=1)["em_top1"]
    cfg = QueryFTConfig(top_k=10, learning_rate=3e-4, epochs=4,
                        max_answer_length=3, update_freq=10)
    _, history = train_query_encoder(
        model, qa, cfg, batch_size=4, dev_pairs=qa, eval_top_k=1, seed=0)
    after = model.evaluate(qa, top_k=1)["em_top1"]
    # query towers should learn to retrieve the gold phrases (loss decreased
    # or dev EM improved); with a tiny random encoder we accept either signal
    assert history["loss"][-1] <= history["loss"][0] * 1.05 or after >= before
    assert len(history["dev_em"]) == cfg.epochs


def test_vecs_on_device_matches_attached(qft_setup):
    # The device-resident candidate arrays, gathered by cand_col, must
    # reproduce the vectors the return_idxs path attaches to result dicts.
    import jax.numpy as jnp

    from densephrases_tpu.train.query import annotate_candidate_cols

    model, qa = qft_setup
    qs = [q for q, _ in qa]
    golds = [a for _, a in qa]
    qvec = model.query2vec(qs)
    ref = model.mips.search(qvec, top_k=10, return_idxs=True,
                            max_answer_length=5)
    results, (sv_dev, ev_dev) = model.mips.search(
        qvec, top_k=10, vecs_on_device=True, max_answer_length=5)
    assert sv_dev.shape[1] == 20 and ev_dev.shape[1] == 20
    cols, t, pt, cm = annotate_candidate_cols(results, golds, n_cands=20)
    sv = np.asarray(jnp.take_along_axis(
        sv_dev, jnp.asarray(cols)[..., None], axis=1))
    ev = np.asarray(jnp.take_along_axis(
        ev_dev, jnp.asarray(cols)[..., None], axis=1))
    for bi in range(len(qs)):
        for ci, r in enumerate(ref[bi][:20]):
            np.testing.assert_allclose(sv[bi, ci], r["start_vec"], atol=1e-5)
            np.testing.assert_allclose(ev[bi, ci], r["end_vec"], atol=1e-5)
    # annotation itself must agree with the attached-vector variant
    _, _, t2, pt2, cm2 = annotate_candidates(ref, golds, n_cands=20)
    np.testing.assert_array_equal(t, t2)
    np.testing.assert_array_equal(pt, pt2)
    np.testing.assert_array_equal(cm, cm2)
