from densephrases_tpu.index.store import PhraseStore, DocMeta, StoreWriter
from densephrases_tpu.index.flat import FlatIndex
from densephrases_tpu.index.ivf import IVFConfig, IVFIndex
from densephrases_tpu.index.sharded import MeshShardedIVF, ShardedIVF
from densephrases_tpu.index.tiered import TieredFlatIndex, TieredIVF
from densephrases_tpu.index.search import MIPS
