"""Runnable slot-filling example (KILT T-REx / Zero-shot-RE shape).

Queries are `subject [SEP] relation`; predictions are scored with
KILT-Accuracy (answer EM gated on provenance) through the real KILT eval
path (role parity: ref examples/slot-filling, baselines 22.3 T-REx /
40.0 ZsRE in the reference README).

Usage: python examples/slot-filling/run.py [--cpu] [--load_dir DIR]
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
    ap.add_argument("--workdir", default="/tmp/dph_slot_filling")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    from densephrases_tpu.eval.kilt import (
        evaluate_kilt,
        results_to_kilt_predictions,
    )

    dp, store = _common.build_tiny_model(args.workdir, args.load_dir)

    # KILT slot-filling records: subject [SEP] relation → object
    records = [
        ("Marie Curie [SEP] discovered", ["polonium", "radium"],
         ["Marie Curie"]),
        ("Ada Lovelace [SEP] collaborator", ["Charles Babbage"],
         ["Ada Lovelace"]),
        ("Alan Turing [SEP] created", ["Turing machine"], ["Alan Turing"]),
    ]
    queries = [r[0] for r in records]
    title2wikiid = {d["title"]: str(i)
                    for i, d in enumerate(_common.TINY_WIKI)}
    # gold rows in the shape load_kilt_data produces from official jsonl
    golds = [{"answers": list(r[1]),
              "provenance": [[title2wikiid[t] for t in r[2]]]}
             for r in records]

    qvec = dp.query2vec(queries)
    results = dp.mips.search(qvec, q_texts=queries, top_k=args.top_k,
                             aggregate=True, agg_strat="opt4")
    preds = results_to_kilt_predictions(results, title2wikiid)
    metrics = evaluate_kilt(preds, golds)
    print("slot-filling metrics:", metrics)
    for q, res in zip(queries, results):
        top = res[0] if res else {}
        print(f"  {q!r} -> {top.get('answer')!r} "
              f"(title {top.get('title')})")


if __name__ == "__main__":
    main()
