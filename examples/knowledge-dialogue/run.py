"""Runnable knowledge-grounded dialogue example (Wizard-of-Wikipedia shape).

The query is the dialogue history (last turns joined); retrieval grounds
the next utterance, scored with R-Precision / Recall@5 over provenance
(role parity: ref examples/knowledge-dialogue, baseline R-Prec 47.0 / 55.7
in the reference README).

Usage: python examples/knowledge-dialogue/run.py [--cpu] [--load_dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _common

_common.force_cpu_if_requested(sys.argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_dir", default="")
    ap.add_argument("--workdir", default="/tmp/dph_dialogue")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    from densephrases_tpu.eval.kilt import (
        evaluate_kilt,
        results_to_kilt_predictions,
    )

    dp, _ = _common.build_tiny_model(args.workdir, args.load_dir)

    # WoW-style: dialogue history → knowledge sentence's page
    dialogues = [
        (["I love the history of computing.",
          "Who wrote the first computer program?"], ["Ada Lovelace"]),
        (["Tell me about famous physicists.",
          "Who developed relativity?"], ["Albert Einstein"]),
        (["We were discussing DNA imaging.",
          "Who captured Photo 51?"], ["Rosalind Franklin"]),
    ]
    queries = [" [SEP] ".join(turns) for turns, _ in dialogues]
    title2wikiid = {d["title"]: str(i)
                    for i, d in enumerate(_common.TINY_WIKI)}
    golds = [{"answers": [], "provenance": [[title2wikiid[t] for t in gold]]}
             for _, gold in dialogues]

    qvec = dp.query2vec(queries)
    results = dp.mips.search(qvec, q_texts=queries, top_k=args.top_k,
                             aggregate=True, agg_strat="opt2")  # passage
    preds = results_to_kilt_predictions(results, title2wikiid)
    metrics = evaluate_kilt(preds, golds, k=args.top_k)
    print("knowledge-dialogue metrics:", metrics)
    for q, res in zip(queries, results):
        top = res[0] if res else {}
        print(f"  {q[:48]!r} -> grounded on {top.get('title')!r}")


if __name__ == "__main__":
    main()
