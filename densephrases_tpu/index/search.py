"""MIPS: the online phrase search engine (two-stage search + aggregation).

TPU-native re-design of the reference ``MIPS`` class
(ref: densephrases/index.py:23-482):

stage 1 — ``search_dense``: stack [query_start; query_end] rows and run one
  batched MIPS over the index (ref: index.py:189-218). Here the index is the
  on-device FlatIndex (or IVF-PQ later), and id→(doc, word) decoding is a
  vectorized binary search over doc bases instead of the idx2id HDF5 lookup.

stage 2 — ``search_phrase``: for every start hit, score candidate ends within
  ``max_answer_length`` filtered positions (and symmetrically starts for end
  hits) (ref: index.py:220-422). The reference loops in Python over
  ``faiss.reconstruct()`` per candidate (ref: index.py:281-300) — its main
  serve-time bottleneck. Because our store is a flat position-addressable
  array, the whole rescore is ONE jitted device function: a windowed gather
  ``vecs[hit + i]``, fused int8 dequant, one einsum against the query vectors,
  validity masking from the global f2o array, and an argmax.

OPQ note: when the store holds rotated codes (c = R·x), we rotate the *query*
once per batch instead of rotating every candidate vector
(ref rotates candidates: index.py:338-345); identical math, B·D² instead of
B·K·L·D² work.

Aggregation (``opt1``–``opt4`` dedup strategies) and context-window adjustment
mirror ref: index.py:167-187,424-448 on the host.
"""

from __future__ import annotations

import functools
import logging
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from densephrases_tpu.eval.metrics import normalize_answer
from densephrases_tpu.index.flat import FlatIndex
from densephrases_tpu.index.store import PhraseStore
from densephrases_tpu.utils.profiling import StageTimer

logger = logging.getLogger(__name__)

NEG_INF = -1e9
SCORE_FLOOR = -1e5  # host-side filter for masked/dummy results (ref: index.py:420)


@functools.partial(jax.jit,
                   static_argnames=("max_answer_length", "return_vecs"))
def _rescore_spans(query_start, query_end, s_gids, e_gids, s_scores, e_scores,
                   vecs, f2o, doc_end_row, doc_base_row, offset, scale,
                   pq=None, *, max_answer_length: int,
                   return_vecs: bool = False):
    """Constrained span rescoring for both anchor directions, on device.

    query_start/query_end: [B, D] (already OPQ-rotated if applicable).
    s_gids/e_gids: [B, K] global row ids of start/end hits.
    s_scores/e_scores: [B, K] their MIPS scores.
    Returns per-direction best partner offsets, joint scores, and partner
    vectors (for query-side fine-tuning, ref: index.py:380-389).

    pq: optional (codes, books, inv_perm, row_list, c_rot) — reconstruct-
    from-codes mode (ref faiss reconstruct() serving, index.py:275-302):
    candidate vectors are DECODED from the IVF-PQ residual codes instead
    of gathered from a resident int8 matrix (vecs is None; queries must
    be in the ROTATED code space, like the decoded vectors)."""
    n = f2o.shape[0]
    L = max_answer_length

    if pq is not None:
        codes, books, inv_perm, row_list, c_rot = pq

        # CPU XLA has no batched bf16xbf16=f32 dot thunk — bf16 only on TPU
        cdt = (jnp.bfloat16 if jax.default_backend() == "tpu"
               else jnp.float32)

        def fetch(rows):  # rows already clipped to [0, n)
            s = inv_perm[rows]
            # codes may be the Pallas scan's lane-padded [N, 128] array
            # (IVFIndex.compact_pq_serve keeps ONLY that copy on device);
            # the real code width is M bytes (8-bit books) or M//2
            # nibble-packed bytes (4-bit books) — slice the pad off
            if int(books.shape[1]) == 16:
                from densephrases_tpu.ops.pq import unpack_nibbles_dev

                code = unpack_nibbles_dev(codes[s], int(books.shape[0]))
            else:
                code = codes[s][..., :books.shape[0]]  # [..., M] uint8
            oh = (code[..., None].astype(jnp.int32)
                  == jax.lax.broadcasted_iota(
                      jnp.int32, code.shape + (books.shape[1],),
                      code.ndim)).astype(cdt)
            res = jnp.einsum("...mk,mkd->...md", oh, books.astype(cdt),
                             preferred_element_type=jnp.float32)
            res = res.reshape(code.shape[:-1] + (-1,))
            return c_rot[row_list[s]] + res
    else:

        def fetch(rows):
            return vecs[rows].astype(jnp.float32) / scale + offset

    def gather_window(gids, offsets):
        win = gids[..., None] + offsets  # [B, K, L]
        wc = jnp.clip(win, 0, n - 1)
        return win, wc, fetch(wc)  # [B, K, L, D]

    up = jnp.arange(L)
    down = jnp.arange(-(L - 1), 1)

    # --- ends for start hits (ref: index.py:323-346)
    win_e, wc_e, evecs = gather_window(s_gids, up)
    dist_e = f2o[wc_e] - f2o[jnp.clip(s_gids, 0, n - 1)][..., None]
    valid_e = (
        (win_e < doc_end_row[jnp.clip(s_gids, 0, n - 1)][..., None])
        & (win_e >= 0)
        & (dist_e >= 0) & (dist_e <= L)
    )
    e_part = jnp.einsum("bkld,bd->bkl", evecs, query_end)
    joint_e = s_scores[..., None] + e_part + NEG_INF * (~valid_e)
    best_e = jnp.argmax(joint_e, axis=-1)  # [B, K] offset of best end
    best_e_score = jnp.max(joint_e, axis=-1)
    best_e_vec = jnp.take_along_axis(
        evecs, best_e[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]

    # --- starts for end hits (ref: index.py:348-371)
    win_s, wc_s, svecs = gather_window(e_gids, down)
    dist_s = f2o[jnp.clip(e_gids, 0, n - 1)][..., None] - f2o[wc_s]
    valid_s = (
        (win_s >= doc_base_row[jnp.clip(e_gids, 0, n - 1)][..., None])
        & (win_s >= 0)
        & (dist_s >= 0) & (dist_s <= L)
    )
    s_part = jnp.einsum("bkld,bd->bkl", svecs, query_start)
    joint_s = e_scores[..., None] + s_part + NEG_INF * (~valid_s)
    best_s = jnp.argmax(joint_s, axis=-1)
    best_s_score = jnp.max(joint_s, axis=-1)
    best_s_vec = jnp.take_along_axis(
        svecs, best_s[..., None, None].astype(jnp.int32), axis=2)[:, :, 0]

    out = {
        "end_offset": best_e, "joint_from_start": best_e_score,
        "start_offset": best_s - (L - 1), "joint_from_end": best_s_score,
    }
    if return_vecs:
        # candidate phrase vectors — only materialized (and shipped to host)
        # for query-side fine-tuning (ref: index.py:380-389 return_idxs)
        anchor_s_vec = fetch(jnp.clip(s_gids, 0, n - 1))
        anchor_e_vec = fetch(jnp.clip(e_gids, 0, n - 1))
        out.update({
            "end_vec_for_start": best_e_vec, "start_vec_anchor": anchor_s_vec,
            "start_vec_for_end": best_s_vec, "end_vec_anchor": anchor_e_vec,
        })
    return out


def _rescore_spans_host(query_start, query_end, s_gids, e_gids, s_scores,
                        e_scores, gather_rows, f2o, doc_end_row, doc_base_row,
                        offset, scale, *, max_answer_length: int,
                        return_vecs: bool = False, n_total: int):
    """Numpy twin of ``_rescore_spans`` for the host-tiered serve path: the
    corpus lives in a memmap, so candidate windows (B·K·L rows) are gathered
    through ``gather_rows`` and the einsum/argmax run on host — cheaper than
    shipping windows to the device for this candidate count."""
    L = max_answer_length
    n = n_total

    def windows(gids, offsets):
        win = gids[..., None] + offsets  # [B, K, L]
        wc = np.clip(win, 0, n - 1)
        v = gather_rows(wc.reshape(-1)).reshape(wc.shape + (-1,))
        v = v.astype(np.float32) / scale + offset
        return win, wc, v

    up = np.arange(L)
    down = np.arange(-(L - 1), 1)
    s_anchor = np.clip(s_gids, 0, n - 1)
    e_anchor = np.clip(e_gids, 0, n - 1)

    win_e, wc_e, evecs = windows(s_gids, up)
    dist_e = f2o[wc_e] - f2o[s_anchor][..., None]
    valid_e = (
        (win_e < doc_end_row[s_anchor][..., None]) & (win_e >= 0)
        & (dist_e >= 0) & (dist_e <= L))
    e_part = np.einsum("bkld,bd->bkl", evecs, query_end)
    joint_e = s_scores[..., None] + e_part + NEG_INF * (~valid_e)
    best_e = np.argmax(joint_e, axis=-1)
    best_e_score = np.max(joint_e, axis=-1)

    win_s, wc_s, svecs = windows(e_gids, down)
    dist_s = f2o[e_anchor][..., None] - f2o[wc_s]
    valid_s = (
        (win_s >= doc_base_row[e_anchor][..., None]) & (win_s >= 0)
        & (dist_s >= 0) & (dist_s <= L))
    s_part = np.einsum("bkld,bd->bkl", svecs, query_start)
    joint_s = e_scores[..., None] + s_part + NEG_INF * (~valid_s)
    best_s = np.argmax(joint_s, axis=-1)
    best_s_score = np.max(joint_s, axis=-1)

    out = {
        "end_offset": best_e, "joint_from_start": best_e_score,
        "start_offset": best_s - (L - 1), "joint_from_end": best_s_score,
    }
    if return_vecs:
        bidx = np.arange(s_gids.shape[0])[:, None]
        kidx = np.arange(s_gids.shape[1])[None, :]
        out.update({
            "end_vec_for_start": evecs[bidx, kidx, best_e],
            "start_vec_anchor":
                gather_rows(s_anchor.reshape(-1)).reshape(
                    s_anchor.shape + (-1,)).astype(np.float32) / scale + offset,
            "start_vec_for_end": svecs[bidx, kidx, best_s],
            "end_vec_anchor":
                gather_rows(e_anchor.reshape(-1)).reshape(
                    e_anchor.shape + (-1,)).astype(np.float32) / scale + offset,
        })
    return out


_SENT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"'(\[])")


def _sentencize(text: str):
    """Rule-based sentence splitter (replaces the spaCy sentencizer,
    ref: index.py:64-66 — host-side, not perf-critical)."""
    sents = []
    pos = 0
    for m in _SENT_RE.finditer(text):
        sents.append((text[pos:m.start()], pos))
        pos = m.end()
    sents.append((text[pos:], pos))
    return [s for s in sents if s[0].strip()] or [(text, 0)]


class MIPS:
    """On-TPU phrase search engine (API parity with ref MIPS, index.py:23)."""

    def __init__(self, store: PhraseStore, index=None, rotation: Optional[np.ndarray] = None,
                 mesh=None, shard_axis: str = "shard", collect_stats: bool = False,
                 preload_meta: bool = True):
        import time as _time

        self.store = store
        self.collect_stats = collect_stats
        self.R = None if rotation is None else jnp.asarray(rotation, jnp.float32)
        stages = {}
        t = _time.perf_counter()
        if index is None:
            index = FlatIndex(store.vecs, store.offset, store.scale,
                              mesh=mesh, shard_axis=shard_axis)
            stages["index_upload_s"] = round(_time.perf_counter() - t, 3)
        self.index = index
        # Host-tiered mode (corpus > HBM): the index exposes a host row
        # gather instead of a device-resident corpus buffer; stage 2 then
        # gathers candidate windows on the host (B·K·L rows, tiny) and
        # rescoring runs in numpy — no corpus-sized device arrays exist.
        self.tiered = hasattr(index, "gather_rows_host")
        self.pq_serve = None

        if preload_meta:
            # Parallel-decompress all doc metadata in the BACKGROUND —
            # serve-time metadata-on-RAM mode (ref: index.py:69-76) without
            # blocking startup; per-doc meta() decompresses on demand until
            # the sweep catches up.
            store.preload_metas(background=True)

        # Vectorized construction of the per-row serve arrays: f2o comes
        # from the store's flat-map sidecar (written at store finalize; a
        # batch decompress rebuilds it for legacy stores); doc bounds are a
        # repeat over the doc-length run lengths. No per-doc Python loop —
        # at 10M rows this is seconds, not hours.
        t = _time.perf_counter()
        f2o = store.f2o_flat()
        stages["f2o_s"] = round(_time.perf_counter() - t, 3)
        t = _time.perf_counter()
        lens = np.diff(store.doc_bases).astype(np.int64)
        # int32 row ids: 2^31 rows x 768 B is ~1.6 TB of codes — far past
        # one host; the sharded/tiered layers own anything bigger
        rdt = np.int32 if store.n_vecs < 2**31 else np.int64
        doc_end_row = np.repeat(store.doc_bases[1:].astype(rdt), lens)
        doc_base_row = np.repeat(store.doc_bases[:-1].astype(rdt), lens)
        if self.tiered:
            self.vecs_dev = None
            self.f2o_host = f2o
            self.doc_end_host = doc_end_row
            self.doc_base_host = doc_base_row
        else:
            # Device-side global arrays for the rescore stage. When the flat
            # index already holds the corpus on this device as a flat 2D
            # buffer, share it (rescore clips row indices, so padding rows
            # are harmless).
            idx_codes = getattr(index, "codes", None)
            idx_refine = getattr(index, "refine_codes", None)
            idx_books = getattr(index, "pq_books", None)
            self.pq_serve = None
            if (isinstance(index, FlatIndex) and index.mesh is None
                    and idx_codes is not None and idx_codes.ndim == 2):
                self.vecs_dev = idx_codes
            elif (idx_refine is not None and idx_refine.ndim == 2
                  and int(idx_refine.shape[0]) >= store.n_vecs
                  and int(idx_refine.shape[1]) == store.dim):
                # PQ/OPQ index with int8 refine: the refine matrix IS the
                # original-order int8 corpus — share it with the rescore
                # stage instead of uploading a second 8 GB copy (the only
                # way BOTH stages of a 10M+ OPQ serve fit one chip's HBM)
                self.vecs_dev = idx_refine
            elif idx_books is not None:
                # Reconstruct-from-codes serving (ref faiss reconstruct(),
                # /root/reference/densephrases/index.py:275-302): no
                # original-order int8 matrix exists anywhere on device —
                # stage 2 decodes candidate windows from the IVF-PQ
                # residual codes. This is the true memory point of the
                # PQ quantizers: device bytes ~= code bytes, not D bytes,
                # per row. Build the (global row → sorted row → list)
                # maps + rotated centroids the decoder needs.
                self.vecs_dev = None
                n_real = index.n_real
                tt = _time.perf_counter()
                # ALL pq_serve arrays are computed ON DEVICE: the first
                # implementation round-tripped row_perm/centroids through
                # host numpy and re-uploaded — 41 s of tunnel traffic at
                # 10.5M (measured, BENCH_IVF pq_* init stages); the device
                # scatter/searchsorted/matmul version is milliseconds.
                rp_dev = jnp.asarray(index.row_perm)[:n_real]
                inv_dev = jnp.zeros(store.n_vecs, jnp.int32).at[rp_dev].set(
                    jnp.arange(n_real, dtype=jnp.int32))
                row_list_dev = (jnp.searchsorted(
                    jnp.asarray(index.list_offsets),
                    jnp.arange(n_real, dtype=jnp.int32), side="right")
                    - 1).astype(jnp.int32)
                rot = index.rotation  # device array or None
                c_rot = (index.centroids if rot is None
                         else index.centroids @ rot)
                # keep one code copy on device: the Pallas scan's lane-
                # padded array serves the decode too (fetch slices to M)
                compacted = index.compact_pq_serve()
                stages["pq_compacted"] = bool(compacted)
                self.pq_serve = {
                    "codes": (index._codes128 if compacted
                              else index.codes),
                    "books": index.pq_books,
                    "inv_perm": inv_dev,
                    "row_list": row_list_dev,
                    "c_rot": jnp.asarray(c_rot, jnp.float32),
                    "rot": rot,
                }
                jax.block_until_ready(self.pq_serve["inv_perm"])
                stages["pq_setup_s"] = round(_time.perf_counter() - tt, 3)
            else:
                self.vecs_dev = jnp.asarray(np.asarray(store.vecs))
            self.f2o_dev = jnp.asarray(f2o)
            self.doc_end_dev = jnp.asarray(doc_end_row)
            self.doc_base_dev = jnp.asarray(doc_base_row)
            jax.block_until_ready(self.f2o_dev)
        stages["serve_arrays_s"] = round(_time.perf_counter() - t, 3)
        self.init_stages = stages
        self.num_docs_list: List[float] = []
        # stage-timer decomposition (ref ad-hoc spans: index.py:194-218 etc.)
        self.timer = StageTimer()

    # ---------------- stage 1 ----------------
    def search_dense(self, query, top_k: int = 10, nprobe: int = 256):
        """query: [B, 2D] (np or device array) — returns start/end hit ids +
        scores as DEVICE arrays (ref: index.py:189-218). Hit ids stay on
        device so stage 2 needs no host round-trip."""
        query = jnp.asarray(query, jnp.float32)
        b = query.shape[0]
        qs, qe = jnp.split(query, 2, axis=1)
        stacked = jnp.concatenate([qs, qe], axis=0)
        if self.R is not None:
            stacked = stacked @ self.R  # rotate queries into code space
        with self.timer.stage("mips_device"):
            scores, gids = self.index.search(stacked, top_k, nprobe=nprobe,
                                             as_numpy=False)
        s_scores, e_scores = scores[:b], scores[b:]
        s_gids, e_gids = gids[:b], gids[b:]

        if self.collect_stats:  # unique-docs-per-query stat (ref: :210-215)
            s_doc, _ = self.store.global_to_doc(np.asarray(s_gids))
            e_doc, _ = self.store.global_to_doc(np.asarray(e_gids))
            num_docs = sum(
                len(set(sd.tolist()) | set(ed.tolist()))
                for sd, ed in zip(s_doc, e_doc)) / max(b, 1)
            self.num_docs_list.append(num_docs)
        return s_gids, e_gids, s_scores, e_scores

    # ---------------- stage 2 ----------------
    def search_phrase(self, query, s_gids, e_gids, s_scores, e_scores,
                      max_answer_length: int = 10, return_idxs: bool = False,
                      return_sent: bool = False, vecs_on_device: bool = False):
        """Constrained span rescore + host result assembly
        (ref: index.py:220-422).

        vecs_on_device (implies return_idxs): candidate phrase vectors are
        NOT shipped to host / attached to result dicts. Instead the return
        value becomes ``(results, (start_vecs, end_vecs))`` with two device
        arrays [B, 2K, D], and every result dict carries ``cand_col`` — its
        column in those arrays. Query-side fine-tuning gathers the vectors
        it needs on device (host annotation only reads the small text
        fields), avoiding a B·K·D-sized D2H+H2D round-trip per batch."""
        if vecs_on_device:
            return_idxs = True
        b, k = s_gids.shape
        query = jnp.asarray(query, jnp.float32)
        qs, qe = jnp.split(query, 2, axis=1)
        if self.R is not None:
            qs = qs @ self.R
            qe = qe @ self.R

        if self.tiered:
            with self.timer.stage("rescore_host"):
                s_gids, e_gids, s_scores, e_scores = jax.device_get(
                    (s_gids, e_gids, s_scores, e_scores))
                res = _rescore_spans_host(
                    np.asarray(qs), np.asarray(qe),
                    np.asarray(s_gids, np.int64), np.asarray(e_gids, np.int64),
                    np.asarray(s_scores), np.asarray(e_scores),
                    self.index.gather_rows_host, self.f2o_host,
                    self.doc_end_host, self.doc_base_host,
                    self.store.offset, self.store.scale,
                    max_answer_length=max_answer_length,
                    return_vecs=return_idxs, n_total=self.store.n_vecs)
                if return_idxs and self.R is not None:
                    rt = np.asarray(self.R).T
                    for key in ("end_vec_for_start", "start_vec_anchor",
                                "start_vec_for_end", "end_vec_anchor"):
                        res[key] = res[key] @ rt
                dev_vecs = None
                if vecs_on_device:
                    dev_vecs = (
                        jnp.asarray(np.concatenate(
                            [res.pop("start_vec_anchor"),
                             res.pop("start_vec_for_end")], axis=1)),
                        jnp.asarray(np.concatenate(
                            [res.pop("end_vec_for_start"),
                             res.pop("end_vec_anchor")], axis=1)))
                    return_idxs = False
            outs = self._assemble(res, np.asarray(s_gids), np.asarray(e_gids),
                                  return_idxs=return_idxs,
                                  return_sent=return_sent)
            return (outs, dev_vecs) if dev_vecs is not None else outs

        pq = None
        out_rot = self.R
        if self.pq_serve is not None:
            # decode-mode: rescore runs in the ROTATED code space — rotate
            # the queries here (stage 1 left them raw: the IVF index owns
            # its rotation), decode candidates as c_rot[list] + decode(code)
            ps = self.pq_serve
            if ps["rot"] is not None:
                qs = qs @ ps["rot"]
                qe = qe @ ps["rot"]
                out_rot = ps["rot"]
            pq = (ps["codes"], ps["books"], ps["inv_perm"],
                  ps["row_list"], ps["c_rot"])
        with self.timer.stage("rescore_device"):
            res = _rescore_spans(
                qs, qe,
                jnp.asarray(s_gids), jnp.asarray(e_gids),
                jnp.asarray(s_scores), jnp.asarray(e_scores),
                self.vecs_dev, self.f2o_dev, self.doc_end_dev, self.doc_base_dev,
                jnp.float32(self.store.offset), jnp.float32(self.store.scale),
                pq, max_answer_length=max_answer_length,
                return_vecs=return_idxs,
            )
            if return_idxs and out_rot is not None:
                # Serve scores are (q·R)·c; hand query-side trainers vectors
                # v = c·Rᵀ so the plain inner product q·v equals the serve
                # score (ref rotates candidates into query space,
                # index.py:338-345,380-389).
                rt = out_rot.T
                for key in ("end_vec_for_start", "start_vec_anchor",
                            "start_vec_for_end", "end_vec_anchor"):
                    res[key] = res[key] @ rt
            dev_vecs = None
            if vecs_on_device:
                # [B, 2K, D] column layout matches _assemble's candidate
                # columns: K start-anchored spans then K end-anchored spans
                dev_vecs = (
                    jnp.concatenate([res.pop("start_vec_anchor"),
                                     res.pop("start_vec_for_end")], axis=1),
                    jnp.concatenate([res.pop("end_vec_for_start"),
                                     res.pop("end_vec_anchor")], axis=1))
                return_idxs = False
            # ONE bundled device→host transfer for everything stage 3 needs
            res, s_gids, e_gids = jax.device_get(
                (res, jnp.asarray(s_gids), jnp.asarray(e_gids)))

        outs = self._assemble(res, s_gids, e_gids, return_idxs=return_idxs,
                              return_sent=return_sent)
        return (outs, dev_vecs) if dev_vecs is not None else outs

    def _assemble(self, res, s_gids, e_gids, return_idxs: bool = False,
                  return_sent: bool = False):
        """Host stage 3: char-offset lookup + result dict construction from
        the downloaded rescore bundle (ref: index.py:374-422)."""
        b = s_gids.shape[0]
        # Assemble per-query candidate list: for each of the K start hits a
        # (start, best end) span, then for each of the K end hits a
        # (best start, end) span — 2K candidates (ref: index.py:374-378).
        span_start_gids = np.concatenate(
            [s_gids, e_gids + res["start_offset"]], axis=1)  # [B, 2K]
        span_end_gids = np.concatenate(
            [s_gids + res["end_offset"], e_gids], axis=1)
        span_scores = np.concatenate(
            [res["joint_from_start"], res["joint_from_end"]], axis=1)
        if return_idxs:
            start_vecs = np.concatenate(
                [res["start_vec_anchor"], res["start_vec_for_end"]], axis=1)
            end_vecs = np.concatenate(
                [res["end_vec_for_start"], res["end_vec_anchor"]], axis=1)

        with self.timer.stage("assemble_host"):
            out = []
            store = self.store
            for bi in range(b):
                cands = []
                doc_pos, s_local = store.global_to_doc(span_start_gids[bi])
                _, e_local = store.global_to_doc(span_end_gids[bi])
                for ci in range(span_start_gids.shape[1]):
                    score = float(span_scores[bi, ci])
                    if score <= SCORE_FLOOR:
                        continue
                    dpos = int(doc_pos[ci])
                    meta = store.meta(dpos)
                    sl, el = int(s_local[ci]), int(e_local[ci])
                    if sl < 0 or el < 0 or sl >= len(meta.f2o_start) \
                            or el >= len(meta.f2o_start):
                        continue
                    start_pos = int(meta.word2char_start[meta.f2o_start[sl]])
                    if len(meta.word2char_end) > 0 and el >= 0:
                        end_pos = int(meta.word2char_end[meta.f2o_start[el]])
                    else:
                        end_pos = start_pos + 1
                    each = {
                        "context": meta.context,
                        "title": [meta.title],
                        "doc_idx": int(store.doc_ids[dpos]),
                        "start_pos": start_pos, "end_pos": end_pos,
                        "start_idx": sl, "end_idx": el,
                        "score": score,
                        # column in the [B, 2K] candidate layout — the key
                        # for gathering this span's vectors from the
                        # vecs_on_device arrays after host-side sorting
                        "cand_col": ci,
                        "start_vec": start_vecs[bi, ci] if return_idxs else None,
                        "end_vec": end_vecs[bi, ci] if return_idxs else None,
                    }
                    each["answer"] = each["context"][each["start_pos"]:each["end_pos"]]
                    each = self.adjust(each)
                    if return_sent:
                        each = self.adjust_sent(each)
                    cands.append(each)
                cands.sort(key=lambda x: -x["score"])
                out.append(cands)
        return out

    # ---------------- context adjustment (ref: index.py:167-187) -----------
    @staticmethod
    def adjust(each, delimiter: str = " [PAR] "):
        last = each["context"].rfind(delimiter, 0, each["start_pos"])
        last = 0 if last == -1 else last + len(delimiter)
        nxt = each["context"].find(delimiter, each["end_pos"])
        nxt = len(each["context"]) if nxt == -1 else nxt
        each["context"] = each["context"][last:nxt]
        each["start_pos"] -= last
        each["end_pos"] -= last
        return each

    @staticmethod
    def adjust_sent(each):
        sents = _sentencize(each["context"])
        starts = np.array([s[1] for s in sents])
        first = max(int((starts <= each["start_pos"]).sum()) - 1, 0)
        last = max(int((starts <= max(each["end_pos"] - 1, 0)).sum()) - 1, first)
        each["context"] = " ".join(s[0] for s in sents[first:last + 1])
        each["start_pos"] -= sents[first][1]
        each["end_pos"] -= sents[first][1]
        return each

    # ---------------- aggregation (ref: index.py:424-448) -------------------
    @staticmethod
    def aggregate_results(results, top_k: int = 10, q_text: Optional[str] = None,
                          agg_strat: str = "opt1"):
        seen = {}
        for r_idx, result in enumerate(results):
            if agg_strat == "opt1":
                key = f'{result["title"]}_{result["start_pos"]}_{result["end_pos"]}'
            elif agg_strat == "opt2":
                key = result["context"]
            elif agg_strat == "opt3":
                key = str(result["title"])
            elif agg_strat == "opt4":
                key = normalize_answer(result["answer"])
            else:
                raise NotImplementedError(f"wrong aggregation strategy {agg_strat}")
            if key not in seen:
                seen[key] = r_idx
            else:
                result["score"] = -1e8
                if agg_strat == "opt4":
                    kept = results[seen[key]]
                    if result["title"][0] not in kept["title"]:
                        kept["title"] = kept["title"] + result["title"]
        results = sorted(results, key=lambda x: -x["score"])
        return [r for r in results if r["score"] > SCORE_FLOOR]

    # ---------------- orchestrator (ref: index.py:450-482) ------------------
    def search(self, query, q_texts=None, nprobe: int = 256, top_k: int = 10,
               aggregate: bool = False, return_idxs: bool = False,
               max_answer_length: int = 10, agg_strat: str = "opt1",
               return_sent: bool = False, vecs_on_device: bool = False):
        query = jnp.asarray(query, jnp.float32)
        s_gids, e_gids, s_scores, e_scores = self.search_dense(
            query, top_k=top_k, nprobe=nprobe)
        outs = self.search_phrase(
            query, s_gids, e_gids, s_scores, e_scores,
            max_answer_length=max_answer_length, return_idxs=return_idxs,
            return_sent=return_sent, vecs_on_device=vecs_on_device)
        if vecs_on_device:
            return outs  # (results, (start_vecs, end_vecs)) — see search_phrase
        if aggregate:
            q_texts = q_texts if q_texts is not None else [None] * len(outs)
            outs = [
                self.aggregate_results(results, top_k, q_text, agg_strat)
                for results, q_text in zip(outs, q_texts)
            ]
        return outs
