"""Flat position-addressable phrase store — the HDF5-dump replacement.

The reference stores phrase vectors as per-doc ragged HDF5 groups with
datasets {start, start2end, word2char_start, word2char_end, f2o_start} and
attrs {context, title, offset, scale} (ref: densephrases/utils/embed_utils.py:
235-246), then at serve time re-reads vectors per hit with a Python loop over
``faiss.reconstruct()`` (ref: densephrases/index.py:275-302) — its biggest
serve-time bottleneck.

TPU-native design: ONE flat int8 array over the whole corpus, with the
structural invariant that a document's (filtered) vectors occupy a contiguous
range. Consequences:

- ``global vec id = doc_base + local position`` — no 1e8/1e9 offset encoding
  (ref: index.py:124-141); id→(doc, word) is a binary search over doc bases
  plus one subtraction, and (doc, word)→vector is direct addressing.
- the two-stage span rescore needs vectors at positions [i, i+L): that is a
  *windowed gather on consecutive rows* of the flat array — one vectorized
  device gather replaces the reference's per-hit Python reconstruct loop.
- the flat array shards trivially across TPU HBM along rows via pjit.

On disk a store is a directory:
  vecs.int8            raw int8 [N, D] (memmap-able)
  doc_bases.npy        int64 [num_docs + 1] prefix offsets into vecs
  doc_ids.npy          int64 [num_docs] external document ids
  meta.pkl             per-doc host metadata (zlib-compressed arrays/contexts,
                       same role as meta_compressed.pkl,
                       ref: scripts/preprocess/compress_metadata.py)
  store.json           {n_vecs, dim, offset, scale, quant}
"""

from __future__ import annotations

import json
import os
import pickle
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE


@dataclass
class DocMeta:
    """Host-side metadata for one document (ref dump schema:
    embed_utils.py:235-246)."""

    doc_id: int
    title: str
    context: str
    word2char_start: np.ndarray  # int32 [num_words]
    word2char_end: np.ndarray  # int32 [num_words]
    f2o_start: np.ndarray  # int32 [n_vecs] filtered→original word position

    def compress(self) -> dict:
        raw = {
            "context": self.context.encode("utf-8"),
            "word2char_start": self.word2char_start.astype(np.int32).tobytes(),
            "word2char_end": self.word2char_end.astype(np.int32).tobytes(),
            "f2o_start": self.f2o_start.astype(np.int32).tobytes(),
        }
        out = {"doc_id": self.doc_id, "title": self.title,
               "sizes": {k: len(v) for k, v in raw.items()}}
        out.update({k: zlib.compress(v) for k, v in raw.items()})
        return out

    @staticmethod
    def decompress(d: dict) -> "DocMeta":
        return DocMeta(
            doc_id=d["doc_id"],
            title=d["title"],
            context=zlib.decompress(d["context"]).decode("utf-8"),
            word2char_start=np.frombuffer(zlib.decompress(d["word2char_start"]), np.int32),
            word2char_end=np.frombuffer(zlib.decompress(d["word2char_end"]), np.int32),
            f2o_start=np.frombuffer(zlib.decompress(d["f2o_start"]), np.int32),
        )


class StoreWriter:
    """Streaming, resumable store writer.

    Append docs one at a time; ``finalize()`` writes the directory layout.
    Resume semantics parity: re-opening an existing store dir and appending
    skips docs already present (ref: generate_phrase_vecs.py:64-71,
    embed_utils.py:227-233 replace-if-exists)."""

    def __init__(self, path: str, dim: int, offset: float = DEFAULT_OFFSET,
                 scale: float = DEFAULT_SCALE, quant: str = "int8"):
        self.path = path
        self.dim = dim
        self.offset = offset
        self.scale = scale
        self.quant = quant
        self._vec_chunks: List[np.ndarray] = []
        self._doc_bases: List[int] = [0]
        self._doc_ids: List[int] = []
        self._metas: List[dict] = []
        self._n = 0
        os.makedirs(path, exist_ok=True)
        self._existing = set()
        if os.path.exists(os.path.join(path, "store.json")):
            prev = PhraseStore.load(path, mmap=True)
            for i, did in enumerate(prev.doc_ids):
                self.add_doc_raw(int(did), prev.vec_rows(i), prev.meta_compressed(i))
            self._existing = set(self._doc_ids)

    def has_doc(self, doc_id: int) -> bool:
        return doc_id in self._existing

    def add_doc_raw(self, doc_id: int, codes: np.ndarray, meta_compressed: dict):
        assert codes.dtype == np.int8 and codes.shape[1] == self.dim
        self._vec_chunks.append(codes)
        self._n += codes.shape[0]
        self._doc_bases.append(self._n)
        self._doc_ids.append(doc_id)
        self._metas.append(meta_compressed)

    def add_doc(self, meta: DocMeta, codes: np.ndarray):
        """codes: int8 [n_vecs, dim] already quantized start vectors."""
        assert codes.shape[0] == len(meta.f2o_start), (
            f"vec count {codes.shape[0]} != f2o_start {len(meta.f2o_start)}"
        )
        self.add_doc_raw(meta.doc_id, codes, meta.compress())

    def finalize(self) -> "PhraseStore":
        from densephrases_tpu import native

        vecs = (np.concatenate(self._vec_chunks, axis=0)
                if self._vec_chunks else np.zeros((0, self.dim), np.int8))
        native.write_bytes(os.path.join(self.path, "vecs.int8"), vecs)
        np.save(os.path.join(self.path, "doc_bases.npy"),
                np.asarray(self._doc_bases, np.int64))
        np.save(os.path.join(self.path, "doc_ids.npy"),
                np.asarray(self._doc_ids, np.int64))
        with open(os.path.join(self.path, "meta.pkl"), "wb") as f:
            pickle.dump(self._metas, f, protocol=pickle.HIGHEST_PROTOCOL)
        with open(os.path.join(self.path, "store.json"), "w") as f:
            json.dump({"n_vecs": int(self._n), "dim": self.dim,
                       "offset": self.offset, "scale": self.scale,
                       "quant": self.quant}, f)
        return PhraseStore.load(self.path)


@dataclass
class PhraseStore:
    """In-RAM (or memmapped) view of a store directory."""

    vecs: np.ndarray  # int8 [N, D]
    doc_bases: np.ndarray  # int64 [num_docs + 1]
    doc_ids: np.ndarray  # int64 [num_docs]
    metas: list  # compressed per-doc dicts
    offset: float = DEFAULT_OFFSET
    scale: float = DEFAULT_SCALE
    _meta_cache: dict = field(default_factory=dict)

    @staticmethod
    def load(path: str, mmap: bool = False) -> "PhraseStore":
        with open(os.path.join(path, "store.json")) as f:
            info = json.load(f)
        n, d = info["n_vecs"], info["dim"]
        mode = "r" if mmap else None
        vecs = np.memmap(os.path.join(path, "vecs.int8"), np.int8, "r",
                         shape=(n, d))
        if not mmap:
            vecs = np.asarray(vecs)
        doc_bases = np.load(os.path.join(path, "doc_bases.npy"))
        doc_ids = np.load(os.path.join(path, "doc_ids.npy"))
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            metas = pickle.load(f)
        return PhraseStore(vecs=vecs, doc_bases=doc_bases, doc_ids=doc_ids,
                           metas=metas, offset=info["offset"], scale=info["scale"])

    @staticmethod
    def merge(shard_paths: List[str], out_path: str) -> "PhraseStore":
        """Merge shard stores into one (ref merge stage:
        build_phrase_index.py:282-338 — here it is pure concatenation because
        ids are (doc_base + position), not global hash ids)."""
        first = PhraseStore.load(shard_paths[0], mmap=True)
        writer = StoreWriter(out_path, first.dim, first.offset, first.scale)
        for sp in shard_paths:
            shard = PhraseStore.load(sp, mmap=True)
            for i in range(shard.num_docs):
                writer.add_doc_raw(int(shard.doc_ids[i]), shard.vec_rows(i),
                                   shard.meta_compressed(i))
        return writer.finalize()

    @property
    def n_vecs(self) -> int:
        return self.vecs.shape[0]

    @property
    def dim(self) -> int:
        return self.vecs.shape[1]

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    def vec_rows(self, doc_pos: int) -> np.ndarray:
        return np.asarray(self.vecs[self.doc_bases[doc_pos]:self.doc_bases[doc_pos + 1]])

    def meta_compressed(self, doc_pos: int) -> dict:
        return self.metas[doc_pos]

    def meta(self, doc_pos: int) -> DocMeta:
        """Decompress-with-cache per-doc metadata (ref: index.py:106-122)."""
        if doc_pos not in self._meta_cache:
            self._meta_cache[doc_pos] = DocMeta.decompress(self.metas[doc_pos])
        return self._meta_cache[doc_pos]

    def preload_metas(self):
        """Decompress ALL doc metadata into the cache using the native
        parallel zlib codec — the serve-time 'metadata on RAM' mode
        (ref: index.py:69-76 meta_compressed.pkl preloading)."""
        from densephrases_tpu import native

        todo = [i for i in range(self.num_docs) if i not in self._meta_cache]
        if not todo:
            return self
        keys = ("context", "word2char_start", "word2char_end", "f2o_start")
        bufs, sizes = [], []
        for i in todo:
            m = self.metas[i]
            known = m.get("sizes")
            for k in keys:
                bufs.append(m[k])
                sizes.append(known[k] if known else -1)
        if all(s >= 0 for s in sizes):
            outs = native.decompress_batch(bufs, sizes)
        else:  # legacy store without size metadata
            outs = [zlib.decompress(b) for b in bufs]
        for j, i in enumerate(todo):
            c, ws, we, fo = outs[4 * j: 4 * j + 4]
            self._meta_cache[i] = DocMeta(
                doc_id=self.metas[i]["doc_id"], title=self.metas[i]["title"],
                context=c.decode("utf-8"),
                word2char_start=np.frombuffer(ws, np.int32),
                word2char_end=np.frombuffer(we, np.int32),
                f2o_start=np.frombuffer(fo, np.int32),
            )
        return self

    def global_to_doc(self, gids: np.ndarray):
        """Map global vec ids → (doc position, local vec position).

        Replaces the reference's idx2id HDF5 lookup + 1e8/1e9 offset decode
        (ref: index.py:124-141) with a vectorized binary search."""
        gids = np.asarray(gids)
        doc_pos = np.searchsorted(self.doc_bases, gids, side="right") - 1
        doc_pos = np.clip(doc_pos, 0, self.num_docs - 1)
        local = gids - self.doc_bases[doc_pos]
        return doc_pos, local

    def doc_base(self, doc_pos) -> np.ndarray:
        return self.doc_bases[doc_pos]
