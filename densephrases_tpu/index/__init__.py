from densephrases_tpu.index.store import PhraseStore, DocMeta, StoreWriter
from densephrases_tpu.index.flat import FlatIndex
from densephrases_tpu.index.search import MIPS
