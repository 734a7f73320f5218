"""Lloyd k-means on TPU — the coarse-quantizer trainer.

Replaces FAISS's CPU/GPU k-means used to train the IVF coarse quantizer
(ref: build_phrase_index.py:96-142 IndexIVF* train). Everything is matmul:

- assignment: argmin ||x - c||² = argmin (||c||² - 2 x·c) — one [chunk, k]
  matmul per data chunk on the MXU, scanned over chunks.
- update: centroid sums accumulated as ``onehot(assign)ᵀ @ x`` — another
  matmul — so the whole iteration is MXU work with no scatters.
- empty clusters are re-seeded from random data points (FAISS does the same).

Runs entirely inside one jit per iteration; data stays on device.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_and_accumulate(x, centroids, *, chunk: int):
    """One Lloyd iteration body: returns (sums [k,D], counts [k], cost)."""
    n, d = x.shape
    k = centroids.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)  # [k]
    cbf = centroids.astype(jnp.bfloat16)

    def body(carry, x_chunk):
        sums, counts, cost = carry
        dots = jax.lax.dot_general(
            x_chunk.astype(jnp.bfloat16), cbf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, k]
        dist = c_sq[None, :] - 2.0 * dots
        assign = jnp.argmin(dist, axis=1)  # [chunk]
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)  # [chunk, k]
        sums = sums + jax.lax.dot_general(
            onehot, x_chunk.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
        cost = cost + jnp.sum(jnp.min(dist, axis=1))
        return (sums, counts, cost), None

    x_chunks = x.reshape(n // chunk, chunk, d)
    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0))
    (sums, counts, cost), _ = jax.lax.scan(body, init, x_chunks)
    return sums, counts, cost


@functools.partial(jax.jit, static_argnames=("chunk",))
def kmeans_assign(x, centroids, *, chunk: int = 4096):
    """Assign rows of x to nearest centroid (L2). Returns int32 [N]."""
    n, d = x.shape
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)], axis=0)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)
    cbf = centroids.astype(jnp.bfloat16)

    def body(_, x_chunk):
        dots = jax.lax.dot_general(
            x_chunk.astype(jnp.bfloat16), cbf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(body, None, x.reshape(-1, chunk, d))
    return assigns.reshape(-1)[:n]


# host-block streaming: the corpus never lives on device in full — each
# block is uploaded, reduced, and dropped (device holds O(block) + [k, D]).
# int8 inputs are shipped as int8 (4× less transfer): assignment against
# L2 is affine-equivariant, so raw codes are assigned against transformed
# centroids c' = (c - offset)·scale, and Lloyd sums are fixed up on host:
# sum_deq = sum_raw/scale + offset·count.
_BLOCK = 262_144


def accumulate_blocks(x: np.ndarray, centroids: np.ndarray,
                      chunk: int = 4096, block: int = _BLOCK,
                      offset: float = 0.0, scale: float = 1.0):
    """Streamed Lloyd accumulation over host-resident data (f32 or int8 with
    (offset, scale) dequant contract). Returns (sums [k, D], counts [k],
    cost) as numpy, in DEQUANTIZED space."""
    n, d = x.shape
    k = centroids.shape[0]
    quant = x.dtype == np.int8
    c_eff = ((centroids - offset) * scale).astype(np.float32) if quant \
        else centroids
    c_dev = jnp.asarray(c_eff)
    sums = np.zeros((k, d), np.float32)
    counts = np.zeros((k,), np.float32)
    cost = 0.0
    for b0 in range(0, n, block):
        xb = np.ascontiguousarray(x[b0:b0 + block])
        pad = (-len(xb)) % chunk
        if pad:
            xb = np.concatenate([xb, np.zeros((pad, d), xb.dtype)])
        s, c, co = _assign_and_accumulate(jnp.asarray(xb), c_dev, chunk=chunk)
        s, c = np.array(s), np.array(c)
        if pad:
            zi = int(np.argmin(np.sum(c_eff ** 2, axis=1)))
            c[zi] -= pad
        sums += s
        counts += c
        cost += float(co)
    if quant:
        sums = sums / scale + offset * counts[:, None]
    return sums, counts, cost


def assign_blocks(x: np.ndarray, centroids: np.ndarray,
                  chunk: int = 4096, block: int = _BLOCK,
                  offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Streamed nearest-centroid assignment (f32, or int8 shipped raw).
    Returns int32 [N] (numpy)."""
    n = x.shape[0]
    quant = x.dtype == np.int8
    c_eff = ((centroids - offset) * scale).astype(np.float32) if quant \
        else centroids
    c_dev = jnp.asarray(c_eff)
    out = np.empty(n, np.int32)
    for b0 in range(0, n, block):
        xb = jnp.asarray(np.ascontiguousarray(x[b0:b0 + block]))
        out[b0:b0 + block] = np.asarray(
            kmeans_assign(xb, c_dev, chunk=min(chunk, max(len(xb), 8))))
    return out


def kmeans(x: np.ndarray, k: int, iters: int = 10, seed: int = 0,
           chunk: int = 4096, verbose: bool = False,
           rounded: bool = False, offset: float = 0.0,
           scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Train k centroids. Returns (centroids [k, D] f32, assignments [N] i32).

    Host-side driver: per-iteration device work is jitted and streamed in
    host blocks (device memory O(block), not O(corpus)); empty-cluster
    re-seeding happens between iterations on the host (rare path).

    x may be raw int8 codes with the (offset, scale) dequant contract —
    blocks ship as int8 (4× less transfer and no host-side f32
    materialization); centroids are always returned in dequantized space.

    rounded=True pads the data to a power-of-two length by resampling
    existing rows, so repeated calls at many nearby sizes (the two-level
    sub-clustering loop) share compiled programs instead of recompiling
    per shape. Duplicated rows get double weight — harmless for training
    a quantizer.
    """
    n, d = x.shape
    n_orig = n
    assert n >= k, f"need at least k={k} points, got {n}"
    quant = x.dtype == np.int8

    def deq(rows):
        return (rows.astype(np.float32) / scale + offset if quant
                else np.asarray(rows, np.float32))

    rng = np.random.default_rng(seed)
    if rounded:
        n_pad = max(1 << int(np.ceil(np.log2(max(n, 512)))), k)
        if n_pad > n:
            x = np.concatenate([x, x[rng.integers(0, n, size=n_pad - n)]])
            n = n_pad
    centroids = deq(x[rng.choice(n, size=k, replace=False)])

    for it in range(iters):
        sums, counts, cost = accumulate_blocks(x, centroids, chunk=chunk,
                                               offset=offset, scale=scale)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        n_empty = int((~nonempty).sum())
        if n_empty:
            centroids[~nonempty] = deq(
                x[rng.choice(n, size=n_empty, replace=False)])
        if verbose:
            logger.info("kmeans iter %d: cost=%.1f empty=%d", it, float(cost), n_empty)

    assigns = assign_blocks(x, centroids, chunk=chunk, offset=offset,
                            scale=scale)
    return centroids, assigns[:n_orig]


# --------------------------------------------------------------------------
# Two-level (hierarchical) k-means — the coarse quantizer at reference scale.
#
# The reference trains nlist = 1,048,576 coarse centroids (ref: README.md:330,
# index name `1048576_flat_OPQ96`); FAISS handles huge nlist with two-level
# clustering. A flat Lloyd at k=10^6 is infeasible on TPU too: the one-hot
# update is O(chunk × k) and a full assignment pass is an [N, k] matmul per
# iteration. Instead:
#
#   level 1: k1 ≈ √k parent centroids, flat Lloyd on the sample
#   level 2: each parent's members clustered into ⌈k·n_i/N⌉ children
#            (bucketed sizes so the sub-runs share compiled programs)
#
# The k children, sorted by parent, ARE the coarse centroids. Full-corpus
# assignment is hierarchical: probe the k1 parents (one small matmul), then
# scan only the probed parents' child ranges — O(N·(k1 + probe·cap)) instead
# of O(N·k). Children-sorted-contiguous is the same layout trick the IVF
# lists use, so the probe scan is contiguous DMA.
# --------------------------------------------------------------------------


def sort_children(centroids: np.ndarray, l1_centroids: np.ndarray):
    """Assign each centroid to its nearest (L2) level-1 parent and sort.

    Returns (sorted_centroids [K, D], parent_offsets [k1+1] i32,
    order [K] — sorted position → original centroid index)."""
    parent = assign_blocks(centroids.astype(np.float32), l1_centroids)
    order = np.argsort(parent, kind="stable")
    offsets = np.searchsorted(
        parent[order], np.arange(l1_centroids.shape[0] + 1)).astype(np.int32)
    return centroids[order], offsets, order


@functools.partial(jax.jit, static_argnames=("iters",))
def _batched_lloyd(X, C0, iters: int):
    """G independent Lloyd runs in ONE dispatch. X [G, N, D] f32,
    C0 [G, K, D] f32 → [G, K, D].

    The point is dispatch latency: driving G sub-k-means runs from the
    host costs G·iters round-trips (observed to dominate the two-level
    build wall-clock on high-latency links); batching makes it one.
    Empty clusters keep their previous centroid (rare at these sizes —
    host-side reseeding is not worth a round-trip here)."""

    k = C0.shape[1]

    def body(_, C):
        Xb = X.astype(jnp.bfloat16)
        dots = jnp.einsum("gnd,gkd->gnk", Xb, C.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        c_sq = jnp.sum(C ** 2, axis=-1)  # [G, K]
        dist = c_sq[:, None, :] - 2.0 * dots  # [G, N, K]
        a = jnp.argmin(dist, axis=-1)  # [G, N]
        oh = jax.nn.one_hot(a, k, dtype=jnp.bfloat16)
        sums = jnp.einsum("gnk,gnd->gkd", oh, Xb,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(oh.astype(jnp.float32), axis=1)  # [G, K]
        newC = sums / jnp.maximum(counts[..., None], 1.0)
        newC = jnp.where(counts[..., None] > 0, newC, C)
        # reseed empty clusters from the points farthest from their
        # current centroid (host kmeans reseeds from random data; doing
        # it in-jit keeps the whole run one dispatch). The e-th empty
        # cluster takes the e-th farthest point.
        empty = counts <= 0  # [G, K]
        min_dist = jnp.min(dist, axis=-1)  # [G, N]
        _, far = jax.lax.top_k(min_dist, k)  # [G, K] farthest row ids
        rank = jnp.clip(jnp.cumsum(empty.astype(jnp.int32), axis=1) - 1,
                        0, k - 1)
        far_rows = jnp.take_along_axis(far, rank, axis=1)  # [G, K]
        reseed = jnp.take_along_axis(
            X, far_rows[..., None], axis=1)  # [G, K, D]
        return jnp.where(empty[..., None], reseed, newC)

    return jax.lax.fori_loop(0, iters, body, C0)


@functools.partial(jax.jit, static_argnames=("iters", "row_chunk"))
def _batched_lloyd_stream(X, C0, *, iters: int, row_chunk: int):
    """G independent Lloyd runs, streamed over row chunks so the [G, n, K]
    distance tensor never materializes for the full n. X [G, N, D] f32
    (N % row_chunk == 0), C0 [G, K, D] f32 → [G, K, D].

    This is what PQ codebook training needs: G = M subspaces, N = the OPQ
    training sample (10^5..10^6 rows) — `_batched_lloyd`'s whole-N distance
    tensor would be tens of GB there. Empty clusters keep their previous
    centroid (with N >> K they are rare; a farthest-point reseed would need
    a second full pass per iteration)."""
    g, n, d = X.shape
    k = C0.shape[1]
    n_chunks = n // row_chunk

    def body(_, C):
        c_sq = jnp.sum(C ** 2, axis=-1)  # [G, K]
        c_bf = C.astype(jnp.bfloat16)

        def chunk_body(carry, ci):
            sums, counts = carry
            Xc = jax.lax.dynamic_slice(
                X, (0, ci * row_chunk, 0), (g, row_chunk, d))
            Xb = Xc.astype(jnp.bfloat16)
            dots = jnp.einsum("gnd,gkd->gnk", Xb, c_bf,
                              preferred_element_type=jnp.float32)
            a = jnp.argmin(c_sq[:, None, :] - 2.0 * dots, axis=-1)
            oh = jax.nn.one_hot(a, k, dtype=jnp.bfloat16)
            sums = sums + jnp.einsum("gnk,gnd->gkd", oh, Xb,
                                     preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(oh.astype(jnp.float32), axis=1)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_body,
            (jnp.zeros((g, k, d), jnp.float32),
             jnp.zeros((g, k), jnp.float32)),
            jnp.arange(n_chunks))
        newC = sums / jnp.maximum(counts[..., None], 1.0)
        return jnp.where(counts[..., None] > 0, newC, C)

    return jax.lax.fori_loop(0, iters, body, C0)


def kmeans_batched(groups, k: int, iters: int = 5, seed: int = 0,
                   max_group_floats: int = 256 << 20,
                   offset: float = 0.0, scale: float = 1.0):
    """Run one k-means per group (all with the same k) on device, batched.

    groups: list of [n_i, D] arrays — f32, or raw int8 codes with the
    (offset, scale) dequant contract. int8 groups are stacked and shipped
    as int8 and the Lloyd runs in RAW-code space (an affine image of the
    true space, so the argmin partition is identical); the returned
    centroids are always dequantized f32.

    Each group is resampled/padded to a shared power-of-two row count
    (duplicated rows get double weight — harmless for quantizer training,
    same trick as kmeans(rounded=True)), then G-sized stacks are
    processed with `_batched_lloyd` — one dispatch per stack instead of
    one per (group, iteration). Returns a list of [k, D] centroid
    arrays."""
    assert groups, "no groups"
    d = groups[0].shape[1]
    quant = groups[0].dtype == np.int8
    dt = np.int8 if quant else np.float32
    n_pad = max(1 << int(np.ceil(np.log2(max(max(len(g) for g in groups),
                                             k, 256)))), k)
    g_max = max(1, max_group_floats // (n_pad * d))
    rng = np.random.default_rng(seed)
    out = []
    for g0 in range(0, len(groups), g_max):
        chunk_groups = groups[g0:g0 + g_max]
        # pad a partial trailing chunk up to g_max when earlier full
        # chunks exist: the duplicated groups waste a few flops but
        # reuse the full-chunk XLA compile (a fresh [G', n, d] shape is
        # a fresh ~30 s compile over the tunnel)
        g_eff = (g_max if len(groups) > g_max else len(chunk_groups))
        X = np.empty((g_eff, n_pad, d), dt)
        C0 = np.empty((g_eff, k, d), np.float32)
        for gi in range(g_eff):
            g = np.asarray(chunk_groups[gi % len(chunk_groups)], dt)
            if len(g) < n_pad:
                extra = g[rng.integers(0, len(g), n_pad - len(g))]
                g = np.concatenate([g, extra])
            X[gi] = g
            C0[gi] = g[rng.choice(n_pad, size=k, replace=False)]
        cents = np.asarray(_batched_lloyd(jnp.asarray(X), jnp.asarray(C0),
                                          iters=iters))
        if quant:
            cents = cents / scale + offset
        out.extend(cents[gi] for gi in range(len(chunk_groups)))
    return out


def kmeans_two_level(x: np.ndarray, k: int, iters: int = 10, seed: int = 0,
                     k1: Optional[int] = None, sub_iters: int = 5,
                     verbose: bool = False, offset: float = 0.0,
                     scale: float = 1.0):
    """Train ~k centroids hierarchically. Returns
    (centroids [K, D] f32 sorted by parent, l1_centroids [k1', D],
    parent_offsets [k1'+1]) — K may differ slightly from k (bucketed child
    counts), and parents that end up with zero children are dropped.

    x may be raw int8 codes with the (offset, scale) contract: the whole
    training pipeline (level-1 Lloyd, member slicing, batched
    sub-clustering) then runs int8-resident — no O(sample) f32
    materialization on the host, which dominated reference-scale build
    time on slow-memory hosts. Centroids are always dequantized f32.
    """
    n, d = x.shape
    quant = x.dtype == np.int8
    if k1 is None:
        k1 = int(np.clip(2 ** int(round(np.log2(max(np.sqrt(k), 2)))), 16, 4096))
    k1 = min(k1, max(n // 8, 1))
    if not quant:
        x = x.astype(np.float32, copy=False)
    l1, assign = kmeans(x, k1, iters=iters, seed=seed,
                        chunk=min(4096, _BLOCK), offset=offset, scale=scale)
    counts = np.bincount(assign, minlength=k1).astype(np.float64)

    # proportional child budget, bucketed to a shared-compile quantum.
    # The quantum scales with the mean child count k/k1: at reference
    # scale (nlist=2^20 → k/k1 ≈ 1024) an 8-wide quantum yields O(100)
    # distinct (k2, nb) buckets — each a separate XLA compile of the
    # batched Lloyd, which dominates wall-clock over the device tunnel.
    q = float(max(8, int(2 ** np.ceil(np.log2(max(k / max(k1, 1), 8)))) // 16))
    raw = k * counts / max(counts.sum(), 1.0)
    k2 = np.maximum(np.round(raw / q) * q, (counts > 0) * 1).astype(np.int64)
    k2 = np.minimum(k2, counts.astype(np.int64))

    # Sub-cluster every parent's members. Parents are bucketed by
    # (child count, power-of-two member count) and each bucket runs as ONE
    # batched-Lloyd dispatch (kmeans_batched) — per-parent host-driven
    # k-means costs parents × iters tunnel round-trips and was the
    # measured wall-clock bottleneck of reference-scale builds.
    children_by_parent = {}
    parents_kept = list(np.nonzero(k2 > 0)[0])
    buckets = {}
    # one argsort + contiguous slices instead of a full boolean scan of x
    # per parent (k1 × O(sample) host traffic adds up at reference scale)
    order = np.argsort(assign, kind="stable")
    bounds = np.searchsorted(assign[order], np.arange(k1 + 1))
    def deq(rows):
        return (rows.astype(np.float32) / scale + offset if quant
                else rows.astype(np.float32))

    for p in parents_kept:
        members = x[order[bounds[p]:bounds[p + 1]]]
        kp = int(k2[p])
        if kp >= len(members):  # degenerate: every member is a centroid
            children_by_parent[p] = deq(members)
        elif kp <= 1:
            children_by_parent[p] = deq(members).mean(0, keepdims=True)
        else:
            nb = 1 << int(np.ceil(np.log2(max(len(members), 256))))
            buckets.setdefault((kp, nb), []).append((p, members))
    for bi, ((kp, _nb), entries) in enumerate(sorted(buckets.items())):
        cents = kmeans_batched([m for _, m in entries], kp, iters=sub_iters,
                               seed=seed + 31 + bi, offset=offset,
                               scale=scale)
        for (p, _), c in zip(entries, cents):
            children_by_parent[p] = c
    children = [children_by_parent[p] for p in parents_kept]
    if verbose:
        logger.info("two-level kmeans: k1=%d parents, %d children total, "
                    "%d batched-Lloyd dispatch buckets", len(parents_kept),
                    sum(len(c) for c in children), len(buckets))

    l1_kept = l1[np.asarray(parents_kept)]
    cents = np.concatenate(children, axis=0).astype(np.float32)
    offsets = np.zeros(len(parents_kept) + 1, np.int32)
    np.cumsum([len(c) for c in children], out=offsets[1:])
    return cents, l1_kept, offsets


@functools.partial(jax.jit, static_argnames=("probe", "cap", "chunk"))
def _assign_hier(x, l1, cents_pad, c_sq_pad, offsets, *,
                 probe: int, cap: int, chunk: int):
    """Hierarchical nearest-centroid assignment of one device block.

    x [n, d] (n multiple of chunk), l1 [k1, d], cents_pad [K+cap, d]
    (child-sorted centroids padded with cap zero rows), c_sq_pad [K+cap]
    (‖c‖², +inf on pad rows), offsets [k1+1]. Returns int32 [n] indices into
    the *sorted* centroid array."""
    n, d = x.shape
    l1_sq = jnp.sum(l1.astype(jnp.float32) ** 2, axis=1)
    l1_bf = l1.astype(jnp.bfloat16)
    cents_bf = cents_pad.astype(jnp.bfloat16)
    col = jnp.arange(cap, dtype=jnp.int32)

    def body(_, xb):
        dots = jax.lax.dot_general(
            xb.astype(jnp.bfloat16), l1_bf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        l1_dist = l1_sq[None, :] - 2.0 * dots
        _, parents = jax.lax.top_k(-l1_dist, probe)  # [chunk, probe]

        xbf = xb.astype(jnp.bfloat16)

        def probe_step(carry, pi):
            best_d, best_i = carry
            par = parents[:, pi]  # [chunk]
            offs = offsets[par]
            lens = offsets[par + 1] - offs
            cand = jax.vmap(
                lambda o: jax.lax.dynamic_slice(cents_bf, (o, 0), (cap, d))
            )(offs)  # [chunk, cap, d]
            csq = jax.vmap(
                lambda o: jax.lax.dynamic_slice(c_sq_pad, (o,), (cap,))
            )(offs)  # [chunk, cap]
            dots2 = jnp.einsum("cd,ckd->ck", xbf, cand,
                               preferred_element_type=jnp.float32)
            dist = csq - 2.0 * dots2
            dist = jnp.where(col[None, :] < lens[:, None], dist, jnp.inf)
            j = jnp.argmin(dist, axis=1)
            dmin = jnp.take_along_axis(dist, j[:, None], axis=1)[:, 0]
            gid = offs + j.astype(jnp.int32)
            take = dmin < best_d
            return (jnp.where(take, dmin, best_d),
                    jnp.where(take, gid, best_i)), None

        init = (jnp.full((chunk,), jnp.inf, jnp.float32),
                jnp.zeros((chunk,), jnp.int32))
        (best_d, best_i), _ = jax.lax.scan(probe_step, init, jnp.arange(probe))
        return None, best_i

    _, out = jax.lax.scan(body, None, x.reshape(n // chunk, chunk, d))
    return out.reshape(-1)


def assign_blocks_hier(x: np.ndarray, l1: np.ndarray, centroids: np.ndarray,
                       offsets: np.ndarray, probe: int = 8,
                       chunk: int = 2048, block: int = _BLOCK,
                       offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Streamed hierarchical assignment over host-resident data (f32, or int8
    shipped raw with (offset, scale) dequant: L2 distances to transformed
    centroids c' = (c-offset)·scale are a uniform scale² of the true ones, so
    the argmin is identical). Returns int32 [N] indices into the sorted
    centroid array."""
    n = x.shape[0]
    quant = x.dtype == np.int8
    tf = (lambda c: ((c - offset) * scale).astype(np.float32)) if quant \
        else (lambda c: c.astype(np.float32))
    lens = np.diff(offsets)
    cap = int(_round_up_mult(max(int(lens.max()), 8), 8))
    k = centroids.shape[0]
    cents_pad = np.concatenate(
        [tf(centroids), np.zeros((cap, centroids.shape[1]), np.float32)])
    c_sq_pad = np.concatenate(
        [np.sum(cents_pad[:k] ** 2, axis=1),
         np.full(cap, np.inf, np.float32)])
    probe = min(probe, len(offsets) - 1)

    l1_dev = jnp.asarray(tf(l1))
    cents_dev = jnp.asarray(cents_pad)
    csq_dev = jnp.asarray(c_sq_pad)
    offs_dev = jnp.asarray(offsets.astype(np.int32))
    out = np.empty(n, np.int32)
    for b0 in range(0, n, block):
        xb = np.ascontiguousarray(x[b0:b0 + block])
        m = len(xb)
        ck = min(chunk, max(_round_up_mult(m, 8), 8))
        pad = (-m) % ck
        if pad:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
        a = _assign_hier(jnp.asarray(xb), l1_dev, cents_dev, csq_dev,
                         offs_dev, probe=probe, cap=cap, chunk=ck)
        out[b0:b0 + m] = np.asarray(a)[:m]
    return out


def _round_up_mult(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# Device-resident hierarchical assignment (reference-scale corpora).
#
# `assign_blocks_hier` scores every row against per-row gathered candidate
# slices with an einsum that is a batched MATVEC — the MXU runs it at a few
# percent of peak, and at 10M rows a full-corpus pass measured in HOURS.
# This formulation turns the whole pass into proper matmuls:
#
#   1. top-1 parent per row (one [block, k1] matmul — MXU-shaped),
#   2. device argsort groups rows by parent,
#   3. each group of `pg` parents is ONE [rows, D] x [D, pg·probe·cap]
#      matmul against the children of those parents' `probe` nearest
#      parents (the per-PARENT neighbor set, precomputed from one tiny
#      [k1, k1] matmul), masked per row to its own parent's neighbor
#      candidates.
#
# Candidate semantics differ slightly from the per-row formulation: a row
# probes the neighbor set of its top-1 PARENT rather than its own top-probe
# parents. The two sets agree except for rows whose 2nd..probe-th nearest
# parents are not among their parent's neighbors — rare, and assignment is
# a quantizer-training heuristic, not a correctness contract (FAISS's own
# hierarchical assignment makes the same approximation). Quality is gated
# by the recall tests, and agreement vs flat assignment is asserted in
# tests/test_ivf.py.
#
# The corpus lives on device ONCE (int8: 4 bytes/dim saved); balance
# rounds re-run assignment against new centroids without re-uploading.
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("chunk",))
def _top1_parent(codes_dev, l1_eff, *, chunk: int = 8192):
    """Top-1 parent for every row of the device-resident corpus. [N] i32."""
    n, d = codes_dev.shape
    pad = (-n) % chunk
    if pad:
        codes_dev = jnp.concatenate(
            [codes_dev, jnp.zeros((pad, d), codes_dev.dtype)])
    l1_sq = jnp.sum(l1_eff ** 2, axis=1)
    l1_bf = l1_eff.astype(jnp.bfloat16)

    def body(_, xb):
        dots = jax.lax.dot_general(
            xb.astype(jnp.bfloat16), l1_bf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return None, jnp.argmin(l1_sq[None, :] - 2.0 * dots,
                                axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(body, None, codes_dev.reshape(-1, chunk, d))
    return out.reshape(-1)[:n]


@functools.partial(jax.jit,
                   static_argnames=("m_bucket", "pg", "probe", "cap"))
def _group_assign(codes_dev, order, parent_sorted, start, p0, nbr,
                  cents_eff, csq_pad, offs, *, m_bucket: int, pg: int,
                  probe: int, cap: int):
    """Assign one group of `pg` consecutive parents' rows.

    Gathers the group's rows from the device corpus, scores them against
    the children of the group's neighbor parents with ONE matmul, masks
    each row down to its own parent's neighbor candidates, and returns
    (best child gid [m_bucket], its distance) — caller keeps the first
    `m` entries."""
    d = codes_dev.shape[1]
    rows_idx = jax.lax.dynamic_slice(order, (start,), (m_bucket,))
    rows = codes_dev[rows_idx].astype(jnp.bfloat16)  # [m, d]
    row_par = jax.lax.dynamic_slice(parent_sorted, (start,), (m_bucket,))
    row_slot = row_par - p0  # [m] in [0, pg) for valid rows

    # candidate children: for each (slot s, rank r) the child range of
    # parent nbr[p0+s, r] — pg*probe contiguous slices of cap rows
    qs = jax.lax.dynamic_slice(nbr, (p0, 0), (pg, probe)).reshape(-1)
    c_offs = offs[qs]  # [pg*probe]
    c_lens = offs[qs + 1] - c_offs
    cand = jax.vmap(
        lambda o: jax.lax.dynamic_slice(cents_eff, (o, 0), (cap, d))
    )(c_offs)  # [pg*probe, cap, d]
    csq = jax.vmap(
        lambda o: jax.lax.dynamic_slice(csq_pad, (o,), (cap,))
    )(c_offs)  # [pg*probe, cap]
    col = jnp.arange(cap, dtype=jnp.int32)
    csq = jnp.where(col[None, :] < c_lens[:, None], csq, jnp.inf)

    dots = jax.lax.dot_general(
        rows, cand.reshape(pg * probe * cap, d).astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [m, pg*probe*cap]
    dist = csq.reshape(-1)[None, :] - 2.0 * dots
    # row may only take candidates of its own parent's neighbor blocks
    slot_of_cand = jnp.repeat(jnp.arange(pg, dtype=jnp.int32), probe * cap)
    dist = jnp.where(slot_of_cand[None, :] == row_slot[:, None], dist,
                     jnp.inf)
    j = jnp.argmin(dist, axis=1)
    gid = (c_offs[j // cap] + (j % cap)).astype(jnp.int32)
    return gid


def assign_corpus_hier(codes_dev, l1: np.ndarray, centroids: np.ndarray,
                       offsets: np.ndarray, probe: int = 8, pg: int = 2,
                       offset: float = 0.0, scale: float = 1.0) -> np.ndarray:
    """Full-corpus hierarchical assignment with a device-resident corpus.

    codes_dev: [N, d] device array (int8 raw codes or f32). Returns int32
    [N] indices into the sorted-centroid array. See module notes above for
    the formulation; `pg` trades dispatch count against wasted flops."""
    import jax as _jax

    n, d = codes_dev.shape
    quant = codes_dev.dtype == jnp.int8
    tf = (lambda c: ((c - offset) * scale).astype(np.float32)) if quant \
        else (lambda c: c.astype(np.float32))
    k1 = l1.shape[0]
    probe = min(probe, k1)
    lens = np.diff(offsets)
    cap = int(_round_up_mult(max(int(lens.max()), 8), 8))
    k = centroids.shape[0]

    l1_eff = tf(l1)
    # parent neighbor sets from one [k1, k1] distance matrix (tiny)
    l1sq = np.sum(l1_eff ** 2, axis=1)
    pdist = l1sq[None, :] - 2.0 * (l1_eff @ l1_eff.T)
    nbr = np.argsort(pdist, axis=1)[:, :probe].astype(np.int32)  # [k1, P]

    cents_eff = np.concatenate(
        [tf(centroids), np.zeros((cap, d), np.float32)])
    csq_pad = np.concatenate(
        [np.sum(cents_eff[:k] ** 2, axis=1), np.full(cap, np.inf, np.float32)])

    l1_dev = jnp.asarray(l1_eff)
    nbr_dev = jnp.asarray(nbr)
    cents_dev = jnp.asarray(cents_eff)
    csq_dev = jnp.asarray(csq_pad)
    offs_dev = jnp.asarray(offsets.astype(np.int32))

    parent = _top1_parent(codes_dev, l1_dev, chunk=8192)
    order = jnp.argsort(parent)
    parent_sorted = parent[order]
    counts = np.bincount(np.asarray(parent), minlength=k1)
    ranges = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    out_parts = []  # (start, m, device result) — collected after dispatch
    for g0 in range(0, k1, pg):
        p0 = g0
        start = int(ranges[g0])
        m = int(ranges[min(g0 + pg, k1)] - start)
        if m == 0:
            continue
        m_bucket = 1 << int(np.ceil(np.log2(max(m, 512))))
        m_bucket = min(m_bucket, n)
        start_c = min(start, n - m_bucket)  # clamp: tail rows masked below
        gid = _group_assign(
            codes_dev, order, parent_sorted, jnp.int32(start_c),
            jnp.int32(p0), nbr_dev, cents_dev, csq_dev, offs_dev,
            m_bucket=m_bucket, pg=min(pg, k1 - g0), probe=probe, cap=cap)
        out_parts.append((start, start_c, m, gid))

    assign_sorted = np.empty(n, np.int32)
    for start, start_c, m, gid in out_parts:
        g = np.asarray(gid)
        assign_sorted[start:start + m] = g[start - start_c:start - start_c + m]
    out = np.empty(n, np.int32)
    out[np.asarray(order)] = assign_sorted
    return out


def assign_hier_streamed(x: np.ndarray, l1: np.ndarray,
                         centroids: np.ndarray, offsets: np.ndarray,
                         probe: int = 8, pg: int = 2,
                         offset: float = 0.0, scale: float = 1.0,
                         block_bytes: int = 4 << 30) -> np.ndarray:
    """Beyond-HBM variant of ``assign_corpus_hier``: streams the corpus in
    device-sized blocks and runs the grouped-matmul assignment per block.
    Same candidate semantics; HBM holds one block + centroids at a time.
    This is the reference-scale (10^9-vector) assignment path."""
    n, d = x.shape
    rows_per_block = max(int(block_bytes // max(x.dtype.itemsize * d, 1)),
                         1 << 16)
    out = np.empty(n, np.int32)
    for b0 in range(0, n, rows_per_block):
        xb = jnp.asarray(np.ascontiguousarray(x[b0:b0 + rows_per_block]))
        out[b0:b0 + xb.shape[0]] = assign_corpus_hier(
            xb, l1, centroids, offsets, probe=probe, pg=pg,
            offset=offset, scale=scale)
        del xb
    return out
