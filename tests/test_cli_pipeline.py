"""Draft end-to-end pipeline through the CLI drivers — the `make draft`
equivalent (ref: Makefile:184-202): train-rc → gen-vecs → index-vecs →
eval-index on tiny samples."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy integration: run in the full gate only


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("draft")
    arts = json.load(open(
        "/root/reference/examples/create-custom-index/articles.json"))["data"]

    # corpus file (SQuAD-style, context-only)
    corpus = {"data": [{
        "title": a["title"],
        "paragraphs": [{"context": p["context"]} for p in a["paragraphs"][:3]],
    } for a in arts[:4]]}
    (ws / "corpus").mkdir()
    json.dump(corpus, open(ws / "corpus" / "docs.json", "w"))

    # RC training file: synthesize QA pairs over the corpus
    ctx = arts[0]["paragraphs"][0]["context"]
    ans = "Kevin Skinner"
    rc = {"data": [{
        "title": arts[0]["title"],
        "paragraphs": [{
            "context": ctx,
            "qas": [{"id": "q1",
                     "question": "who won season 4 of america's got talent?",
                     "answers": [{"text": ans,
                                  "answer_start": ctx.index(ans)}]}],
        }],
    }]}
    json.dump(rc, open(ws / "rc.json", "w"))

    # open-domain test file
    qa = json.load(open(
        "/root/reference/examples/create-custom-index/questions.json"))
    json.dump(qa, open(ws / "qa.json", "w"))
    return ws


def test_full_draft_pipeline(workspace):
    ws = workspace
    enc_dir = str(ws / "enc")
    dump_dir = str(ws / "dump")

    from densephrases_tpu.cli import (
        build_phrase_index,
        eval_phrase_retrieval,
        generate_phrase_vecs,
        train_rc,
    )

    # 1) train-rc (draft config, few steps)
    state, rates = train_rc.main([
        "--train_file", str(ws / "rc.json"), "--output_dir", enc_dir,
        "--num_train_epochs", "1", "--per_device_train_batch_size", "1",
        "--max_seq_length", "128", "--doc_stride", "64",
        "--max_query_length", "24", "--lambda_neg", "1.0",
        "--lambda_flt", "1.0", "--draft", "--verbose",
    ])
    assert os.path.exists(os.path.join(enc_dir, "vocab.txt"))
    assert 0 <= min(rates.values()) <= max(rates.values()) <= 1

    # 2) generate phrase vecs
    store = generate_phrase_vecs.main([
        "--load_dir", enc_dir, "--data_dir", str(ws / "corpus"),
        "--predict_file", "docs.json", "--dump_dir", dump_dir,
        "--max_seq_length", "128",
    ])
    assert store.n_vecs > 100

    # 3) build index (small SQ8)
    index = build_phrase_index.main([
        "--dump_dir", dump_dir, "--num_clusters", "16",
        "--fine_quant", "SQ8",
    ])
    assert index.n_total == store.n_vecs

    # 4) eval retrieval through the index
    metrics = eval_phrase_retrieval.main([
        "--load_dir", enc_dir, "--dump_dir", dump_dir,
        "--index_name", "start/16_flat_SQ8",
        "--test_path", str(ws / "qa.json"),
        "--top_k", "5", "--eval_batch_size", "4",
        "--save_dir", str(ws / "out"),
        "--max_seq_length", "128", "--max_query_length", "24",
    ])
    assert "em_top1" in metrics
    assert os.path.exists(str(ws / "out" / "eval_logger.txt"))


def test_eval_psg_mode(workspace):
    """Passage-level eval mode through the CLI (eval-index-psg parity).
    Depends on artifacts produced by test_full_draft_pipeline (same
    module-scoped workspace)."""
    ws = workspace
    if not os.path.exists(str(ws / "dump" / "start" / "16_flat_SQ8")):
        pytest.skip("draft pipeline artifacts missing (run full module)")
    from densephrases_tpu.cli import eval_phrase_retrieval

    metrics = eval_phrase_retrieval.main([
        "--load_dir", str(ws / "enc"), "--dump_dir", str(ws / "dump"),
        "--index_name", "start/16_flat_SQ8",
        "--test_path", str(ws / "qa.json"),
        "--eval_psg", "--psg_top_k", "10", "--eval_batch_size", "4",
        "--save_dir", str(ws / "out_psg"),
        "--max_seq_length", "128", "--max_query_length", "24",
    ])
    assert any(k.startswith("recall@") for k in metrics)
    assert os.path.exists(str(ws / "out_psg" / "fid_qa.json.json"))


def test_train_rc_with_distillation(workspace, tmp_path):
    """train_rc --lambda_kl with a trained teacher: teacher weights load,
    stay frozen, and are stripped from the saved encoder."""
    ws = workspace
    from densephrases_tpu.cli import train_cross_encoder, train_rc

    teacher_dir = str(tmp_path / "teacher")
    train_cross_encoder.main([
        "--train_file", str(ws / "rc.json"), "--output_dir", teacher_dir,
        "--num_train_epochs", "1", "--per_device_train_batch_size", "1",
        "--max_seq_length", "128", "--doc_stride", "64",
        "--max_query_length", "24", "--draft",
    ])

    out_dir = str(tmp_path / "student")
    state, rates = train_rc.main([
        "--train_file", str(ws / "rc.json"), "--output_dir", out_dir,
        "--num_train_epochs", "1", "--per_device_train_batch_size", "1",
        "--max_seq_length", "128", "--doc_stride", "64",
        "--max_query_length", "24", "--lambda_kl", "1.0",
        "--teacher_dir", teacher_dir, "--draft",
    ])
    assert "cross" in state.params  # teacher present during training
    # teacher unchanged by training (frozen)
    import jax as _jax
    import numpy as _np
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.train.cross_encoder import init_cross_params
    from densephrases_tpu.utils.checkpoint import restore_checkpoint
    from densephrases_tpu.cli.common import load_config

    cfg = load_config(teacher_dir)
    template = init_cross_params(_jax.random.PRNGKey(0), cfg)
    teacher = restore_checkpoint(os.path.join(teacher_dir, "params"), template)
    _np.testing.assert_array_equal(
        _np.asarray(state.params["qa_outputs"]["w"]),
        _np.asarray(teacher["qa_outputs"]["w"]))
    # saved encoder has no teacher weights
    saved = restore_checkpoint
    from densephrases_tpu.cli.common import load_encoder
    params, _, _ = load_encoder(out_dir)
    assert "cross" not in params


def test_train_rc_checkpoint_resume(workspace, tmp_path):
    """Resume restores optimizer state + step and fast-forwards the data
    order (ref: train_rc.py:99-110,147-189)."""
    ws = workspace
    from densephrases_tpu.cli import train_rc
    from densephrases_tpu.utils.checkpoint import latest_checkpoint

    out = str(tmp_path / "resume_enc")
    args = ["--train_file", str(ws / "rc.json"), "--output_dir", out,
            "--per_device_train_batch_size", "1",
            "--max_seq_length", "128", "--doc_stride", "64",
            "--max_query_length", "24", "--draft",
            "--num_train_epochs", "8", "--save_steps", "2"]
    state1, _ = train_rc.main(args + ["--max_steps", "4"])
    assert int(np.asarray(state1.step)) == 4
    ck = latest_checkpoint(os.path.join(out, "ckpt"))
    assert ck is not None and ck.endswith("step_4")

    # resume: continues from step 4 up to 6
    state2, _ = train_rc.main(args + ["--max_steps", "6"])
    assert int(np.asarray(state2.step)) == 6
