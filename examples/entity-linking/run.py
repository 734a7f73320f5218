"""Runnable entity-linking example (KILT AIDA-YAGO2 shape).

The query is a sentence with an entity mention; the prediction is the
retrieved page, scored with R-Precision over provenance (role parity:
ref examples/entity-linking, baseline R-Prec 61.6 / 68.4 in the reference
README). Document-level retrieval: the top-1 title IS the linked entity.

Usage: python examples/entity-linking/run.py [--cpu] [--load_dir DIR]
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
    ap.add_argument("--workdir", default="/tmp/dph_entity_linking")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    from densephrases_tpu.eval.kilt import (
        evaluate_kilt,
        results_to_kilt_predictions,
    )

    dp, _ = _common.build_tiny_model(args.workdir, args.load_dir)

    # AIDA-style: mention in context, gold = the linked wiki page
    records = [
        ("She discovered radium while working in Paris [ENT] Curie [ENT]",
         ["Marie Curie"]),
        ("The Analytical Engine program was written by [ENT] Lovelace "
         "[ENT]", ["Ada Lovelace"]),
        ("[ENT] Turing [ENT] broke the Enigma code during the war",
         ["Alan Turing"]),
    ]
    queries = [r[0] for r in records]
    title2wikiid = {d["title"]: str(i)
                    for i, d in enumerate(_common.TINY_WIKI)}
    golds = [{"answers": list(r[1]),
              "provenance": [[title2wikiid[t] for t in r[1]]]}
             for r in records]

    qvec = dp.query2vec(queries)
    results = dp.mips.search(qvec, q_texts=queries, top_k=args.top_k,
                             aggregate=True, agg_strat="opt3")  # doc-level
    preds = results_to_kilt_predictions(results, title2wikiid)
    # entity linking predicts the page title as the answer
    for p, res in zip(preds, results):
        p["answer"] = res[0]["title"][0] if res else ""
    metrics = evaluate_kilt(preds, golds)
    print("entity-linking metrics:", metrics)
    for q, p in zip(queries, preds):
        print(f"  {q[:50]!r} -> {p['answer']!r}")


if __name__ == "__main__":
    main()
