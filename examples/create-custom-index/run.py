"""Runnable custom-index example: build a phrase index over articles.json
and answer questions.json (the reference's create-custom-index walkthrough,
self-contained; trains a tiny encoder from scratch when no --load_dir is
given, since no pretrained weights ship with this environment).

Usage:
  python examples/create-custom-index/run.py \
      --articles articles.json --questions questions.json \
      [--load_dir trained_encoder/] [--workdir /tmp/custom_index]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--questions", required=True)
    ap.add_argument("--load_dir", default="")
    ap.add_argument("--workdir", default="/tmp/custom_index")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    import jax

    from densephrases_tpu import DensePhrases, MIPS
    from densephrases_tpu.cli.common import load_encoder
    from densephrases_tpu.data.tokenization import train_wordpiece_vocab
    from densephrases_tpu.dump import dump_phrases
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import init_encoder_params

    arts = json.load(open(args.articles))["data"]
    docs = [{"doc_id": i, "title": a["title"],
             "paragraphs": [p["context"] for p in a["paragraphs"]]}
            for i, a in enumerate(arts)]
    print(f"{len(docs)} documents")

    if args.load_dir:
        params, config, tokenizer = load_encoder(args.load_dir)
    else:
        print("no --load_dir: tiny from-scratch encoder (smoke-test quality)")
        texts = [p for d in docs for p in d["paragraphs"]]
        tokenizer = train_wordpiece_vocab(texts, vocab_size=4000)
        config = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
        params = init_encoder_params(jax.random.PRNGKey(0), config)

    store = dump_phrases(params, config, tokenizer, docs,
                         os.path.join(args.workdir, "store"),
                         max_seq_length=min(
                             128, config.max_position_embeddings))
    print(f"store: {store.num_docs} docs / {store.n_vecs} phrase vectors")

    dp = DensePhrases(params, config, tokenizer, MIPS(store),
                      max_query_length=32)
    questions = json.load(open(args.questions))["data"]
    for row in questions:
        answers = dp.search(row["question"], retrieval_unit="phrase",
                            top_k=args.top_k)
        print(f"\nQ: {row['question']}")
        print(f"   gold: {row.get('answers')}")
        print(f"   top-{args.top_k}: {answers}")


if __name__ == "__main__":
    main()
