"""D_small real-data accuracy protocol at CORPUS scale: one encoder,
document-held-out dev questions, EM as a function of the number of real
paragraphs indexed, with the query-FT delta at the largest scale.

The reference's identity is open-domain EM over a real corpus; its
"D_small" development setting (ref: README.md:304, ~62 EM semi-open)
indexes just the NQ-dev passages, and the full setting indexes all of
Wikipedia (EM@1 41.3 after query-FT, README.md:137). No pretrained
weights or Wikipedia dump exist in this environment, so this driver
builds the closest offline-constructible analog over the ~18.8k-paragraph
offline harvest (preprocess/offline_corpus.py), exercising the FULL stack
on real text with non-oracle queries:

1. DOCUMENT-HELD-OUT DEV: dev questions are cloze-QG pairs drawn from
   whole documents the encoder NEVER trains on (split by document, not
   question hash — dev passages are genuinely open). Dev paragraphs are
   part of every index so the questions stay answerable at all scales.
2. CORPUS SCALE: the same encoder + the same fixed dev set, with the
   index grown 112 → ~2k → ~18.8k real paragraphs (nested by whole
   documents). This is the semi-open → open-domain axis: EM decays as
   real distractor text grows (ref: README.md:304 62 semi-open vs
   README.md:132 31.9 open, same model).
3. CHECKPOINT SELECTION: RC training holds out 5% of train pairs and
   keeps the best-dev-loss checkpoint (early-stops after patience
   evals) — the step budget can no longer collapse an arm.
4. QUERY-FT: query-side fine-tuning against the frozen LARGEST index
   (ref: train_query.py:34-179) — the reference's signature EM lever,
   reported as a delta on the same dev set.

Every phase checkpoints under --workdir (qa JSON, encoder/, per-scale
store/), so a crashed run resumes. Writes ONE artifact to --out.

Run: python -m densephrases_tpu.tools.dsmall --pretrained cache/mlm_enc2
"""

import argparse
import hashlib
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

CORPUS_CACHE = os.path.join(
    os.path.dirname(__file__), "..", "..", "cache", "corpus_docs.json")


def _h(s: str) -> int:
    return int(hashlib.sha1(s.encode()).hexdigest()[:8], 16)


def split_docs(docs, dev_par_target: int, max_dev_doc_pars: int = 40):
    """Deterministic document-held-out split: dev docs are picked in
    title-hash order until the dev paragraph budget is met. One reference
    article (the smallest) is force-included so dev covers the wiki genre
    too, not just docstring prose."""
    arts = [d for d in docs if ":" not in d["title"]
            and not d["title"].startswith(("SQuAD", "demo"))]
    forced = min(arts, key=lambda d: len(d["paragraphs"])) if arts else None
    dev_docs, n = [], 0
    if forced is not None:
        dev_docs.append(forced)
        n = len(forced["paragraphs"])
    for d in sorted(docs, key=lambda d: _h(d["title"])):
        if n >= dev_par_target:
            break
        if d is forced or len(d["paragraphs"]) > max_dev_doc_pars:
            continue
        dev_docs.append(d)
        n += len(d["paragraphs"])
    dev_titles = {d["title"] for d in dev_docs}
    train_docs = [d for d in docs if d["title"] not in dev_titles]
    return train_docs, dev_docs


def build_qa(docs, per_par: int, seed: int = 0, max_pars: int = 0):
    """Cloze-QG pairs over documents (real answer spans in real text;
    ref scripts/question_generation role). Dedup by (question, answer).
    max_pars > 0 caps the paragraph count (title-hash order)."""
    from densephrases_tpu.tools.question_generation import cloze_qg_extended

    pars = [(d["title"], f"{di}_{pi}", p)
            for di, d in enumerate(docs)
            for pi, p in enumerate(d["paragraphs"])]
    if max_pars and len(pars) > max_pars:
        pars = sorted(pars, key=lambda t: _h(t[1] + t[2][:32]))[:max_pars]
    examples, seen = [], set()
    for title, par_key, par in pars:
        for q, a in cloze_qg_extended(par, max_questions=per_par, seed=seed):
            start = par.find(a)
            if start < 0 or (q, a) in seen or len(a) < 2:
                continue
            seen.add((q, a))
            examples.append({
                "qid": hashlib.sha1((q + a).encode()).hexdigest()[:16],
                "question": q, "title": title, "context": par,
                "par_key": par_key,
                "answer_text": a, "answer_start": start})
    return examples


def nested_corpora(dev_docs, train_docs, scales):
    """Nested corpora by WHOLE documents: dev docs first (every scale
    must answer the fixed dev set), then train docs in title-hash order
    until each paragraph target is met."""
    ordered = dev_docs + sorted(train_docs, key=lambda d: _h(d["title"]))
    out = []
    for target in scales:
        corpus, n = [], 0
        for d in ordered:
            if n >= target:
                break
            corpus.append(d)
            n += len(d["paragraphs"])
        out.append(corpus)
    return out


def _metrics(dp, exs, top_k=10):
    pairs = [(e["question"], [e["answer_text"]]) for e in exs]
    t0 = time.perf_counter()
    m = dp.evaluate(pairs, top_k=top_k)
    return {
        "em_top1": round(float(m["em_top1"]), 4),
        "em_top10": round(float(m["em_topk"]), 4),
        "f1_top1": round(float(m["f1_top1"]), 4),
        "f1_top10": round(float(m["f1_topk"]), 4),
        "n": m["n"], "eval_s": round(time.perf_counter() - t0, 1),
    }


def main():
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dsmall_corpus")
    ap.add_argument("--corpus", default=os.path.abspath(CORPUS_CACHE),
                    help="structured corpus JSON "
                         "(preprocess.offline_corpus.build_corpus_docs)")
    ap.add_argument("--pretrained", required=True,
                    help="MLM-pretrained encoder dir (cli/train_mlm); "
                         "supplies vocab/config (ref: SpanBERT init role, "
                         "encoder.py:20-52)")
    ap.add_argument("--scales", default="112,2048,18780",
                    help="comma list of corpus sizes in PARAGRAPHS")
    ap.add_argument("--dev_pars", type=int, default=90,
                    help="dev paragraph budget (held-out documents)")
    ap.add_argument("--dev_per_par", type=int, default=12,
                    help="QG pairs per dev paragraph")
    ap.add_argument("--train_per_par", type=int, default=20)
    ap.add_argument("--train_max_pars", type=int, default=1500,
                    help="cap on train paragraphs used for QG")
    # RC training (with dev-loss checkpoint selection)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seq", type=int, default=192)
    ap.add_argument("--pre_batch", type=int, default=2)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--patience", type=int, default=6,
                    help="early stop after this many evals w/o dev-loss "
                         "improvement")
    # query-FT
    ap.add_argument("--qft_epochs", type=int, default=6)
    ap.add_argument("--qft_pairs", type=int, default=4000)
    ap.add_argument("--qft_topk", type=int, default=40)
    ap.add_argument("--qft_lr", type=float, default=1e-4)
    ap.add_argument("--qft_batch", type=int, default=24)
    ap.add_argument("--dump_batch", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "DSMALL.json"))
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    import jax

    # honor JAX_PLATFORMS=cpu (the env var alone does not switch backends
    # under the axon plugin; see tests/conftest)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from densephrases_tpu.cli.common import load_encoder, save_encoder
    from densephrases_tpu.data.rc_dataset import batches, convert_rc_examples
    from densephrases_tpu.dump import dump_phrases
    from densephrases_tpu.index.search import MIPS
    from densephrases_tpu.index.store import PhraseStore
    from densephrases_tpu.model import DensePhrases
    from densephrases_tpu.models.encoder import RCLossConfig, rc_loss
    from densephrases_tpu.preprocess.offline_corpus import build_corpus_docs
    from densephrases_tpu.train.rc import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    scales = sorted(int(s) for s in args.scales.split(","))
    fp = {k: getattr(args, k)
          for k in ("scales", "dev_pars", "dev_per_par", "train_per_par",
                    "train_max_pars", "steps", "batch", "lr", "seq",
                    "pre_batch")}
    res = {}
    if os.path.exists(args.out):
        try:
            prev = json.load(open(args.out))
        except Exception:
            prev = {}
        if prev.get("protocol") == fp:
            res = prev  # merge-resume within ONE protocol configuration
    res["protocol"] = fp
    res["backend"] = jax.default_backend()

    docs = build_corpus_docs(out_path=args.corpus)
    res["n_docs"], res["n_paragraphs"] = (
        len(docs), sum(len(d["paragraphs"]) for d in docs))

    # ------------- phase 0: document split + QG (cached) ---------------
    train_docs, dev_docs = split_docs(docs, args.dev_pars)
    res["split"] = {
        "dev_docs": len(dev_docs),
        "dev_paragraphs": sum(len(d["paragraphs"]) for d in dev_docs),
        "dev_titles_sample": [d["title"] for d in dev_docs[:8]],
        "train_docs": len(train_docs)}
    qa_path = os.path.join(args.workdir, "qa_doc_split.json")
    if os.path.exists(qa_path):
        blob = json.load(open(qa_path))
        train_ex, dev_ex = blob["train"], blob["dev"]
    else:
        dev_ex = build_qa(dev_docs, args.dev_per_par, seed=0)
        train_ex = build_qa(train_docs, args.train_per_par, seed=0,
                            max_pars=args.train_max_pars)
        json.dump({"train": train_ex, "dev": dev_ex}, open(qa_path, "w"))
    # RC-dev slice for checkpoint selection (5%, never trained on)
    rc_dev = [e for e in train_ex if int(e["qid"][:4], 16) % 20 == 0]
    rc_train = [e for e in train_ex if int(e["qid"][:4], 16) % 20 != 0]
    res["n_train"], res["n_rc_dev"], res["n_dev"] = (
        len(rc_train), len(rc_dev), len(dev_ex))
    print(f"QA: {len(rc_train)} train / {len(rc_dev)} rc-dev / "
          f"{len(dev_ex)} dev (document-held-out)", flush=True)

    args.pretrained = os.path.abspath(args.pretrained)  # orbax needs abs
    args.workdir = os.path.abspath(args.workdir)
    pre_params, config, tok = load_encoder(args.pretrained)
    res["pretrained_dir"] = args.pretrained

    # ------------- phase 1: RC training w/ checkpoint selection --------
    enc_dir = os.path.join(args.workdir, "encoder")
    if os.path.exists(os.path.join(enc_dir, "config.json")):
        params, _, _ = load_encoder(enc_dir)
        train_info = res.get("rc_train")
        print("loaded cached encoder", flush=True)
    else:
        feats = convert_rc_examples(rc_train, tok, max_seq_length=args.seq,
                                    doc_stride=args.seq // 2,
                                    max_query_length=24)
        dev_feats = convert_rc_examples(rc_dev, tok,
                                        max_seq_length=args.seq,
                                        doc_stride=args.seq // 2,
                                        max_query_length=24)
        print(f"{len(feats)} train / {len(dev_feats)} rc-dev features",
              flush=True)
        opt = make_optimizer(lr=args.lr, warmup_steps=args.steps // 10,
                             total_steps=args.steps)
        state = create_train_state(pre_params, opt,
                                   pbn_size=args.pre_batch,
                                   batch_size=args.batch,
                                   hidden=config.hidden_size)
        loss_cfg = RCLossConfig(lambda_neg=1.0, lambda_flt=1.0)
        step_fn = make_train_step(config, loss_cfg, opt, attn_impl="auto")

        @jax.jit
        def eval_loss(params, batch):
            total, _ = rc_loss(params, config, batch, loss_cfg,
                               deterministic=True)
            return total

        dev_batches = [
            {k: jnp.asarray(v) for k, v in b.items()}
            for b in batches(dev_feats, args.batch, shuffle=False,
                             drop_last=len(dev_feats) >= args.batch)]

        def dev_loss(params):
            if not dev_batches:
                return float("inf")
            return float(np.mean([
                float(eval_loss(params, b)) for b in dev_batches]))

        rng = jax.random.PRNGKey(1)
        order_rng = np.random.default_rng(2)
        t0 = time.perf_counter()
        n_step, stale, best = 0, 0, (float("inf"), None, 0)
        curve = []
        m = None
        while n_step < args.steps and stale < args.patience:
            idx = order_rng.permutation(len(feats))
            for b in batches([feats[i] for i in idx], args.batch,
                             shuffle=False, drop_last=True):
                b = {k: jnp.asarray(v) for k, v in b.items()}
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, b, sub)
                n_step += 1
                if n_step % args.eval_every == 0:
                    dl = dev_loss(state.params)
                    curve.append(
                        {"step": n_step, "loss": round(float(m["loss"]), 4),
                         "dev_loss": round(dl, 4)})
                    if dl < best[0]:
                        best = (dl, jax.tree.map(np.asarray, state.params),
                                n_step)
                        stale = 0
                    else:
                        stale += 1
                    print(f"step {n_step}/{args.steps} loss "
                          f"{float(m['loss']):.4f} dev {dl:.4f} "
                          f"{'*' if stale == 0 else ''} "
                          f"({time.perf_counter() - t0:.0f}s)", flush=True)
                if n_step >= args.steps or stale >= args.patience:
                    break
        params = (best[1] if best[1] is not None
                  else jax.tree.map(np.asarray, state.params))
        train_info = {
            "train_s": round(time.perf_counter() - t0, 1),
            "steps_run": n_step, "best_step": best[2],
            "best_dev_loss": round(best[0], 4),
            "early_stopped": stale >= args.patience,
            "n_features": len(feats), "curve": curve}
        save_encoder(enc_dir, params, config, tok)
        params, _, _ = load_encoder(enc_dir)
    res["rc_train"] = train_info

    # ------------- phase 2: per-scale dump + eval ----------------------
    corpora = nested_corpora(dev_docs, train_docs, scales)
    res.setdefault("scales", {})
    dp_largest = None
    for target, corpus in zip(scales, corpora):
        key = f"pars{target}"
        n_pars = sum(len(d["paragraphs"]) for d in corpus)
        cached = res["scales"].get(key)
        store_dir = os.path.join(args.workdir, f"store_{key}")
        dump_docs = [{"doc_id": i, "title": d["title"],
                      "paragraphs": d["paragraphs"]}
                     for i, d in enumerate(corpus)]
        if os.path.exists(os.path.join(store_dir, "store.json")):
            store = PhraseStore.load(store_dir)
            dump_s = cached.get("dump_s") if cached else None
        else:
            t0 = time.perf_counter()
            store = dump_phrases(params, config, tok, dump_docs, store_dir,
                                 max_seq_length=args.seq,
                                 batch_size=args.dump_batch,
                                 attn_impl="auto")
            dump_s = round(time.perf_counter() - t0, 1)
        dp = DensePhrases(params, config, tok, MIPS(store),
                          max_query_length=24)
        if target == scales[-1]:
            dp_largest = dp
        if cached and "dev" in cached:
            print(f"[{key}] cached: {cached['dev']}", flush=True)
            continue
        row = {"n_docs": len(corpus), "n_paragraphs": n_pars,
               "n_vecs": int(store.n_vecs), "dump_s": dump_s,
               "dev": _metrics(dp, dev_ex)}
        res["scales"][key] = row
        print(f"[{key}] {row['n_vecs']} vecs dev {row['dev']}", flush=True)
        with open(os.path.abspath(args.out), "w") as f:
            json.dump(res, f, indent=1)

    # ------------- phase 3: query-FT at the largest scale --------------
    if args.qft_epochs > 0 and dp_largest is not None \
            and "qft" not in res:
        from densephrases_tpu.train.query import (
            QueryFTConfig,
            train_query_encoder,
        )

        key = f"pars{scales[-1]}"
        base_dev = res["scales"][key]["dev"]
        qft_ex = sorted(rc_train, key=lambda e: _h(e["qid"]))
        qft_ex = qft_ex[: args.qft_pairs]
        train_pairs = [(e["question"], [e["answer_text"]]) for e in qft_ex]
        dev_pairs = [(e["question"], [e["answer_text"]]) for e in dev_ex]
        cfg = QueryFTConfig(top_k=args.qft_topk,
                            learning_rate=args.qft_lr,
                            epochs=args.qft_epochs)
        t0 = time.perf_counter()
        _, history = train_query_encoder(
            dp_largest, train_pairs, cfg, batch_size=args.qft_batch,
            dev_pairs=dev_pairs, eval_top_k=10)
        qft_dev = _metrics(dp_largest, dev_ex)
        res["qft"] = {
            "scale": key, "epochs": args.qft_epochs,
            "n_pairs": len(train_pairs), "top_k": args.qft_topk,
            "lr": args.qft_lr,
            "train_s": round(time.perf_counter() - t0, 1),
            "loss": [round(x, 4) for x in history["loss"]],
            "train_top1": [round(x, 4) for x in history["top1"]],
            "dev_em_by_epoch": [round(x, 4) for x in history["dev_em"]],
            "dev": qft_dev,
            "em1_delta": round(qft_dev["em_top1"] - base_dev["em_top1"], 4),
            "em10_delta": round(
                qft_dev["em_top10"] - base_dev["em_top10"], 4),
        }
        print(f"qft: dev {qft_dev} (delta EM@1 {res['qft']['em1_delta']})",
              flush=True)
        save_encoder(os.path.join(args.workdir, "encoder_qft"),
                     dp_largest.params, config, tok)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res)[:2000])


if __name__ == "__main__":
    main()
