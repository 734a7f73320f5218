"""Parallel / sharded dump + index-build orchestration.

Parity with ref: scripts/parallel/dump_phrases.py (spawn N dump workers over
file ranges) and scripts/parallel/add_to_index.py (size-balanced bins with
global id offsets :14-23,64). TPU-native differences: a worker is a host
process driving its own device (or device slice); shard stores carry doc ids,
so the merge (PhraseStore.merge) needs no 1e8/1e9 id-offset arithmetic —
global row ids are assigned by concatenation order.
"""

from __future__ import annotations

import logging
import math
import os
import subprocess
import sys
from typing import Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)


def make_ranges(n_files: int, n_workers: int) -> List[Tuple[int, int]]:
    """Even contiguous file ranges (ref: dump_phrases.py:27-38)."""
    per = math.ceil(n_files / n_workers)
    return [(i * per, min((i + 1) * per, n_files))
            for i in range(n_workers) if i * per < n_files]


def bin_by_size(sizes: Dict[str, int], n_bins: int) -> List[List[str]]:
    """Size-balanced binning, largest-first greedy
    (ref: add_to_index.py:14-23 bin_names)."""
    bins: List[List[str]] = [[] for _ in range(n_bins)]
    totals = [0] * n_bins
    for name in sorted(sizes, key=lambda k: -sizes[k]):
        i = totals.index(min(totals))
        bins[i].append(name)
        totals[i] += sizes[name]
    return [b for b in bins if b]


def run_parallel_dump(data_dir: str, dump_dir: str, load_dir: str,
                      n_workers: int = 4, max_seq_length: int = 512,
                      filter_threshold: float = -1e8, draft: bool = False,
                      extra_args: Optional[Sequence[str]] = None,
                      dry_run: bool = False) -> List[List[str]]:
    """Launch one generate_phrase_vecs process per file range. Each worker
    writes its own shard store `phrase_shard_{i}`; merge with
    ``merge_shards`` afterwards. Returns the commands (and runs them unless
    dry_run)."""
    n_files = len([n for n in os.listdir(data_dir) if n.endswith(".json")])
    cmds = []
    for i, (lo, hi) in enumerate(make_ranges(n_files, n_workers)):
        cmd = [sys.executable, "-m",
               "densephrases_tpu.cli.generate_phrase_vecs",
               "--load_dir", load_dir, "--data_dir", data_dir,
               "--predict_file", f"{lo}:{hi}",
               "--dump_dir", dump_dir,
               "--phrase_dir", f"phrase_shard_{i}",
               "--max_seq_length", str(max_seq_length),
               "--index_filter", str(filter_threshold)]
        if draft:
            cmd.append("--draft")
        cmd.extend(extra_args or [])
        cmds.append(cmd)
    if not dry_run:
        procs = [subprocess.Popen(c) for c in cmds]
        for p in procs:
            rc = p.wait()
            if rc != 0:
                raise RuntimeError(f"dump worker failed rc={rc}")
    return cmds


def merge_shards(dump_dir: str, out_name: str = "phrase") -> str:
    """Concatenate shard stores into the final store
    (ref merge stage: build_phrase_index.py:282-338 — pure concatenation
    here thanks to the flat id scheme)."""
    from densephrases_tpu.index.store import PhraseStore

    shards = sorted(
        os.path.join(dump_dir, n) for n in os.listdir(dump_dir)
        if n.startswith("phrase_shard_"))
    out = os.path.join(dump_dir, out_name)
    PhraseStore.merge(shards, out)
    logger.info("merged %d shards → %s", len(shards), out)
    return out
