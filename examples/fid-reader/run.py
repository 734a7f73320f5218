"""Runnable FiD-reader export example.

Retrieves passages, reports DPR-style has-answer recall@k, and writes the
Fusion-in-Decoder reader input file with <e>phrase</e> markers (role
parity: ref examples/fusion-in-decoder; eval_phrase_retrieval.py psg mode).

Usage: python examples/fid-reader/run.py [--cpu] [--load_dir DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _common

_common.force_cpu_if_requested(sys.argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_dir", default="")
    ap.add_argument("--workdir", default="/tmp/dph_fid")
    ap.add_argument("--top_k", type=int, default=5)
    args = ap.parse_args()

    from densephrases_tpu.eval.passage import evaluate_passages, to_fid_format

    dp, _ = _common.build_tiny_model(args.workdir, args.load_dir)

    questions = [
        "Who discovered radium?",
        "Who wrote the first computer program?",
        "Who broke the Enigma code?",
    ]
    answers = [["Marie Curie"], ["Ada Lovelace"], ["Alan Turing"]]

    qvec = dp.query2vec(questions)
    results = dp.mips.search(qvec, q_texts=questions, top_k=args.top_k,
                             aggregate=True, agg_strat="opt2")  # passage dedup

    metrics = evaluate_passages(results, answers, ks=(1, args.top_k))
    print("passage recall:", metrics)

    out_path = os.path.join(args.workdir, "fid_input.json")
    to_fid_format(questions, answers, results, mark_phrase=True,
                  out_path=out_path)
    rows = json.load(open(out_path))
    print(f"wrote {out_path}: {len(rows)} rows, "
          f"{len(rows[0]['ctxs'])} ctxs each")
    print("first ctx:", json.dumps(rows[0]["ctxs"][0])[:120])


if __name__ == "__main__":
    main()
