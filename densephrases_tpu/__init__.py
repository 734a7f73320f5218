"""densephrases_tpu — a TPU-native phrase index-and-query engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DensePhrases
(princeton-nlp/DensePhrases): index every phrase span of a corpus as a pair of
dense (start, end) vectors from a BERT-family encoder, store the quantized
vectors in a flat TPU-shardable array store, and answer natural-language
questions by fused maximum-inner-product search + constrained span rescoring —
all on TPU.

Public API mirrors the reference package exports
(ref: densephrases/__init__.py:1-4 exports Encoder, MIPS, Options, DensePhrases):

  - ``Options``        — config registry (ref: densephrases/options.py)
  - ``PhraseEncoder``  — three-tower span encoder (ref: densephrases/encoder.py)
  - ``MIPS``           — on-TPU phrase search engine (ref: densephrases/index.py)
  - ``DensePhrases``   — user-facing facade (ref: densephrases/model.py)
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Restore the documented JAX_PLATFORMS semantics: some out-of-tree TPU
    # plugins (the axon tunnel) grab the device even when the env var says
    # cpu. An explicit cpu request must never touch the real chip — a "CPU
    # smoke run" silently landing on the TPU can kill a concurrent
    # multi-hour job on it.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from densephrases_tpu.options import Options
from densephrases_tpu.models.encoder import PhraseEncoder
from densephrases_tpu.index.search import MIPS
from densephrases_tpu.model import DensePhrases

Encoder = PhraseEncoder  # reference-compatible alias

__version__ = "0.1.0"
__all__ = ["Options", "PhraseEncoder", "Encoder", "MIPS", "DensePhrases"]
