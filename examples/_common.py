"""Shared fixture builder for the runnable examples.

Every example drives the real pipeline end-to-end (tokenizer training →
phrase dump → MIPS → task eval) on a tiny in-repo corpus with a tiny
from-scratch encoder, so they run offline in ~a minute. With real trained
weights (--load_dir, as in create-custom-index/run.py) the same code paths
produce the reference tasks' quality.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# A small entity-centric corpus: each doc is a KILT-style wiki page.
TINY_WIKI = [
    {"title": "Marie Curie",
     "text": "Marie Curie was a physicist and chemist. Marie Curie "
             "discovered the elements polonium and radium. Marie Curie "
             "was born in Warsaw and won the Nobel Prize twice."},
    {"title": "Albert Einstein",
     "text": "Albert Einstein was a theoretical physicist. Albert Einstein "
             "developed the theory of relativity. Albert Einstein was born "
             "in Ulm and won the Nobel Prize in 1921."},
    {"title": "Ada Lovelace",
     "text": "Ada Lovelace was a mathematician. Ada Lovelace wrote the "
             "first computer program. Ada Lovelace worked with Charles "
             "Babbage on the Analytical Engine in London."},
    {"title": "Alan Turing",
     "text": "Alan Turing was a computer scientist. Alan Turing created "
             "the Turing machine and broke the Enigma code. Alan Turing "
             "was born in London."},
    {"title": "Rosalind Franklin",
     "text": "Rosalind Franklin was a chemist. Rosalind Franklin captured "
             "the X-ray image of DNA known as Photo 51. Rosalind Franklin "
             "worked at King's College London."},
]


def force_cpu_if_requested(argv):
    """Honor a --cpu flag BEFORE jax initializes (env alone is ignored on
    some platforms; the config update is required)."""
    if "--cpu" in argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")


def build_tiny_model(workdir: str, load_dir: str = ""):
    """Train-or-load an encoder, dump TINY_WIKI, return (dp, store)."""
    import jax

    from densephrases_tpu import DensePhrases, MIPS
    from densephrases_tpu.data.tokenization import train_wordpiece_vocab
    from densephrases_tpu.dump import dump_phrases
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import init_encoder_params

    docs = [{"doc_id": i, "title": d["title"], "paragraphs": [d["text"]]}
            for i, d in enumerate(TINY_WIKI)]
    if load_dir:
        from densephrases_tpu.cli.common import load_encoder

        params, config, tokenizer = load_encoder(load_dir)
    else:
        tokenizer = train_wordpiece_vocab([d["text"] for d in TINY_WIKI],
                                          vocab_size=1200)
        config = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
        params = init_encoder_params(jax.random.PRNGKey(0), config)
    store = dump_phrases(params, config, tokenizer, docs,
                         os.path.join(workdir, "store"), max_seq_length=128,
                         batch_size=4)
    dp = DensePhrases(params, config, tokenizer, MIPS(store),
                      max_query_length=32)
    return dp, store
