"""Index build driver.

Driver parity: ref build_phrase_index.py:341-405 run_index stage machine
(coarse/fine/add are one fused on-device build here; 'merge' concatenates
shard stores). Index naming keeps the reference convention
``{num_clusters}_flat_{quant}`` (ref: :19-44).

Usage:
  python -m densephrases_tpu.cli.build_phrase_index \
      --dump_dir dump/ --num_clusters 1024 --fine_quant OPQ96 [--replace]
"""

from __future__ import annotations

import logging
import os

import numpy as np

from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
from densephrases_tpu.index.store import PhraseStore
from densephrases_tpu.options import Options

logger = logging.getLogger(__name__)


def main(argv=None):
    opts = Options().parse(argv, groups=["index"])
    ix = opts.index

    store_path = os.path.join(ix.dump_dir, ix.phrase_dir)
    store = PhraseStore.load(store_path, mmap=True)
    logger.info("store: %d docs / %d vecs", store.num_docs, store.n_vecs)

    name = f"{ix.num_clusters}_flat_{ix.fine_quant}"
    out_dir = os.path.join(ix.dump_dir, "start", name)
    if os.path.exists(os.path.join(out_dir, "ivf.pkl")):
        logger.info("index exists at %s (use a new name to rebuild)", out_dir)
        return IVFIndex.load(out_dir)

    cfg = IVFConfig(
        num_clusters=min(ix.num_clusters, max(store.n_vecs // 4, 1)),
        fine_quant=ix.fine_quant if ix.fine_quant != "none" else "SQ8",
        sample_ratio=min(1.0, ix.doc_sample_ratio + ix.vec_sample_ratio),
    )
    index = IVFIndex.build(np.asarray(store.vecs), cfg,
                           offset=store.offset, scale=store.scale,
                           verbose=opts.verbose)
    index.save(out_dir)
    logger.info("index saved to %s", out_dir)
    return index


if __name__ == "__main__":
    main()
