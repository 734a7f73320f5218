"""IVF-vs-flat at scale: the at-scale measurement grid.

Builds a >=10M-vector clustered corpus, an exact flat index, and IVF
indexes for EACH requested fine quantization (SQ8 / SQ4 / OPQ96 — the
reference's headline index is 1048576_flat_OPQ96, README.md:171-178),
then measures:

- per-call latency (tunnel round trip included) at batch 1 and 64,
- dispatch-amortized per-scan device time (reps scans in ONE jitted
  fori_loop — the only way to resolve sub-10-ms scans through a
  ~30-60 ms-RTT link),
- packed (exact-length block DMA, ops/ivf_pack) vs grouped (fixed-cap
  dynamic_slice) union-scan time for the raw-code quantizers,
- recall@20 against the exact flat scan, and index byte sizes.

Writes one JSON blob to docs/IVF_SCALE.json and prints it.

Crash-resumable end to end (the TPU worker can die mid-job): the corpus
is memmap-cached, the coarse quantizer is cached and SHARED by all fine
quants (IVFIndex.build coarse_cache), every built index is saved to
disk with a .done marker, and partial results flush to the output JSON
after every phase (existing keys are skipped on re-run).

Designed around this environment's asymmetric tunnel (H2D ~1 GB/s, D2H
~22 MB/s) and its single slow host core:

- the corpus is generated ON DEVICE in one jitted ``lax.map`` (seconds,
  vs ~90 min of host-side numpy on this VM) and used in place for the
  flat phase — zero transfers on the exact-scan path;
- it is streamed D2H once into a disk memmap cache so the IVF build
  phase (whose k-means drivers stream host blocks H2D) and any re-run
  after a crash never regenerate.

Run on the live TPU:  python tools/bench_ivf_scale.py [--n 10485760]
(never kill it mid-run — see the tunnel note in .claude/skills/verify)
"""

import argparse
import functools
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from densephrases_tpu.ops.quant import DEFAULT_OFFSET, DEFAULT_SCALE


def gen_corpus_device(n: int, d: int, n_clusters: int = 4096, seed: int = 0,
                      block: int = 1 << 20):
    """Clustered int8 corpus generated entirely on device.

    Same distribution as the host generator this replaces: cluster
    centers ~ N(-2, 1), members = center + 0.3 * N(0, 1), quantized with
    the store's affine int8 contract. Returns a device int8 array
    [n, d]; peak device temp memory is O(block * d) f32 thanks to the
    lax.map over blocks.
    """
    import jax
    import jax.numpy as jnp

    block = min(block, n)
    assert n % block == 0, f"n={n} must be a multiple of block={block}"
    n_blocks = n // block
    key = jax.random.PRNGKey(seed)
    kc, kb = jax.random.split(key)

    @jax.jit
    def gen():
        centers = jax.random.normal(kc, (n_clusters, d), jnp.float32) - 2.0

        def gen_block(bk):
            ki, kn = jax.random.split(bk)
            idx = jax.random.randint(ki, (block,), 0, n_clusters)
            x = centers[idx] + 0.3 * jax.random.normal(
                kn, (block, d), jnp.float32)
            q = jnp.clip(jnp.round((x - DEFAULT_OFFSET) * DEFAULT_SCALE),
                         -128, 127)
            return q.astype(jnp.int8)

        blocks = jax.lax.map(gen_block, jax.random.split(kb, n_blocks))
        return blocks.reshape(n, d)

    return gen()


def cache_corpus(codes_dev, path: str, block: int = 1 << 20) -> None:
    """Stream a device corpus D2H into an int8 memmap at `path`.

    ~22 MB/s on this tunnel on a good day -> ~6 min for 10M x 768, but
    the link has been observed 10x slower — so the stream is RESUMABLE:
    a `.progress` sidecar records the last fully-flushed block, and a
    re-run (the device corpus is deterministic for a fixed seed) skips
    straight past it. `.done` marks full completion; partial memmaps
    without `.progress` are never trusted.
    """
    n, d = codes_dev.shape
    prog = path + ".progress"
    start = 0
    if os.path.exists(path) and os.path.exists(prog):
        try:
            prows, pd = (int(v) for v in open(prog).read().split()[:2])
            if pd == d and 0 < prows <= n and (prows % block == 0
                                               or prows == n):
                start = prows
        except (ValueError, OSError):
            start = 0
    mm = np.lib.format.open_memmap(
        path, mode="r+" if start else "w+", dtype=np.int8, shape=(n, d))
    if start and mm.shape != (n, d):
        # open_memmap(mode="r+") trusts the on-disk header over the shape
        # argument — a user-supplied --cache reused across scales would
        # otherwise resume into a wrong-shaped memmap and bless it .done
        del mm
        start = 0
        mm = np.lib.format.open_memmap(path, mode="w+", dtype=np.int8,
                                       shape=(n, d))
    t0 = time.perf_counter()
    if start:
        print(f"  resuming cache at row {start:,}/{n:,}", flush=True)
    for b0 in range(start, n, block):
        b1 = min(b0 + block, n)
        mm[b0:b1] = np.asarray(codes_dev[b0:b1])
        mm.flush()
        with open(prog, "w") as f:
            f.write(f"{b1} {d}\n")  # clamped: the final record must be <= n
        print(f"  cached {b1:,}/{n:,} rows "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    del mm
    with open(path + ".done", "w") as f:
        f.write(f"{n} {d}\n")
    if os.path.exists(prog):
        os.remove(prog)


def timed(fn, n_rep: int = 5, warmup: int = 2):
    """Median wall time of fn() (which must block until ready)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def dispatch_floor_ms(n: int = 6) -> float:
    """Measured round-trip floor of a trivial dispatch + value fetch."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: (a * 2).sum())
    float(f(x))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return 1000.0 * ts[len(ts) // 2]


def amortized_ms(run_fn, reps: int, floor_ms: float, n_rep: int = 3) -> float:
    """Per-iteration ms of a fori-loop bench callable (see
    IVFIndex.bench_union_repeat): fetch the checksum, subtract the
    dispatch floor, divide by reps; median over n_rep runs."""
    float(run_fn())  # compile + warm
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run_fn())
        ts.append(time.perf_counter() - t0)
    return max(1000.0 * float(np.median(ts)) - floor_ms, 0.0) / reps


def _default_workdir() -> str:
    """Repo-local cache dir when writable (survives this environment's
    per-session /tmp wipes), else /tmp."""
    repo_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "cache")
    repo_cache = os.path.normpath(repo_cache)
    try:
        os.makedirs(repo_cache, exist_ok=True)
        probe = os.path.join(repo_cache, ".write_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        return repo_cache
    except OSError:
        return "/tmp"


def main():
    import logging

    # force=True: jax's import already installed root handlers at WARNING,
    # which would silently swallow the build-phase INFO progress logs
    logging.basicConfig(
        level=logging.INFO, force=True,
        format="%(asctime)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=65536)
    ap.add_argument("--quants", default="SQ8,SQ4,OPQ96",
                    help="comma list of fine quantizations to build+measure")
    ap.add_argument("--refine_factor", type=int, default=None,
                    help="override IVFConfig.refine_factor at SEARCH time "
                         "(PQ refine window = top_k x this; applied to "
                         "cached indexes without a rebuild). Rows land "
                         "under ivf_<quant>_rf<N>.")
    ap.add_argument("--reps", type=int, default=16,
                    help="fori-loop repeats for amortized timings")
    ap.add_argument("--probes", default="16,64,256",
                    help="comma list of nprobe values to measure")
    ap.add_argument("--no_grouped", action="store_true",
                    help="skip the grouped fixed-cap comparison scans "
                         "entirely (they cost minutes and the PQ ones "
                         "can crash the TPU worker)")
    ap.add_argument("--grouped_budget_ms", type=float, default=20000.0,
                    help="max single-dispatch wall budget for the grouped "
                         "baseline's fori-loop (a >~30 s dispatch can crash "
                         "the TPU worker); reps shrink to fit, and the "
                         "baseline is skipped when even 2 reps exceed it")
    ap.add_argument("--cache", default=None,
                    help="corpus memmap cache path (.npy); default "
                         "{workdir}/ivf_scale_corpus_{n}x{d}.npy")
    ap.add_argument("--workdir", default=_default_workdir(),
                    help="where corpus/coarse/index caches live; defaults "
                         "to <repo>/cache (survives VM resets, gitignored) "
                         "when the repo tree is writable, else /tmp")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore an existing output JSON (still reuses "
                         "corpus/coarse/index caches)")
    ap.add_argument("--coarse_only", action="store_true",
                    help="train/assign/balance the coarse quantizer only "
                         "and measure probe cost — the nlist=2^20 "
                         "at-scale exercise (ref builds 1,048,576 "
                         "clusters, README.md:330). Use a dedicated "
                         "--out; skips the flat phase entirely.")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "IVF_SCALE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from densephrases_tpu.index.flat import FlatIndex
    from densephrases_tpu.index.ivf import IVFConfig, IVFIndex

    cache = args.cache or os.path.join(
        args.workdir, f"ivf_scale_corpus_{args.n}x{args.d}.npy")
    out_path = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    res = {}
    if not args.fresh and os.path.exists(out_path):
        with open(out_path) as f:
            res = json.load(f)
        if (res.get("n"), res.get("d"), res.get("nlist")) != (
                args.n, args.d, args.nlist):
            res = {}
    quants = [q.strip() for q in args.quants.split(",")]
    # rows for quants NOT in this run are kept as-is (a prior run's
    # results stay on the table); only the requested quants are
    # (re)processed below. The n/d/nlist mismatch check above already
    # guards against rows from a different-scale run.
    res.update({"n": args.n, "d": args.d, "nlist": args.nlist,
                "backend": jax.default_backend(), "reps": args.reps})

    def flush():
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)

    rng = np.random.default_rng(1)
    have_cache = os.path.exists(cache) and os.path.exists(cache + ".done")
    flat_done = all(k in res for k in
                    ("flat_b64_ms", "flat_rep_b64_ms", "flat_b1_ms"))

    # ---------------- corpus (device-generated, memmap-cached) ----------
    t0 = time.perf_counter()
    codes_dev = None
    if have_cache:
        print(f"loading cached corpus {cache} ...", flush=True)
        host_codes = np.load(cache, mmap_mode="r")
        assert host_codes.shape == (args.n, args.d)
        if not flat_done and not args.coarse_only:
            # the flat phase needs the corpus on device; resumed runs with
            # the flat rows already measured skip the 8 GB upload entirely
            # (its deferred free would otherwise overlap the IVF load and
            # OOM the chip)
            codes_dev = jnp.asarray(host_codes)  # H2D ~1 GB/s
    else:
        print(f"generating {args.n:,} x {args.d} corpus on device ...",
              flush=True)
        codes_dev = gen_corpus_device(args.n, args.d)
        codes_dev.block_until_ready()
        res["gen_s"] = round(time.perf_counter() - t0, 1)
        print(f"generated in {res['gen_s']}s; caching to {cache} ...",
              flush=True)
        cache_corpus(codes_dev, cache)
        host_codes = np.load(cache, mmap_mode="r")
    res["corpus_s"] = round(time.perf_counter() - t0, 1)
    floor_ms = dispatch_floor_ms()
    res["roundtrip_floor_ms"] = round(floor_ms, 2)
    flush()

    if args.coarse_only:
        # ---- nlist=2^20 exercise: coarse quantizer only ----------------
        # train (two-level k-means) + full-corpus hierarchical assignment
        # + balance, with per-stage wall clocks, then the production probe
        # cost (the [B, nlist] max-inner-product matmul + top-nprobe that
        # every search pays; _probe_score). Ref scale: README.md:330.
        del codes_dev  # assignment manages its own device residency
        jax.clear_caches()
        cfgk = IVFConfig(num_clusters=args.nlist, fine_quant="SQ8",
                         kmeans_iters=6,
                         sample_ratio=min(1.0, 1e6 / args.n),
                         balance_factor=4.0)
        coarse_dir = os.path.join(
            args.workdir,
            f"ivf_scale_coarse_{args.n}x{args.d}_{args.nlist}")
        stage_s = {}
        t0 = time.perf_counter()
        centroids, assign, _ = IVFIndex.build_coarse(
            host_codes, cfgk, verbose=True, coarse_cache=coarse_dir,
            stage_s=stage_s)
        total_s = round(time.perf_counter() - t0, 1)
        lens = np.bincount(assign, minlength=centroids.shape[0])
        # empty-list analysis (VERDICT r4 missing #4): at mean rows/list
        # ~10, k-means dead centroids are EXPECTED — compare the empty
        # fraction with the Poisson(mean) null and split empties between
        # the original k-means centroids and the balancer-grown tail
        # (split ε-copies that captured no rows on the refinement pass)
        mean = float(lens.mean())
        k_req = min(args.nlist, centroids.shape[0])
        row = {
            "nlist_requested": args.nlist,
            "nlist_actual": int(centroids.shape[0]),
            "stage_s": stage_s or {"cached": True},
            "total_s": total_s,
            "list_mean": round(mean, 2),
            "list_max": int(lens.max()),
            "list_p99": int(np.percentile(lens, 99)),
            "empty_lists": int((lens == 0).sum()),
            "empty_in_first_nlist": int((lens[:k_req] == 0).sum()),
            "empty_in_grown_tail": int((lens[k_req:] == 0).sum()),
            "poisson_null_empty": int(
                np.exp(-mean) * centroids.shape[0]),
            "centroid_bytes": int(centroids.size * 2),  # bf16 resident
        }
        # probe cost: bf16 centroids resident, jitted matmul + top-nprobe.
        # Two crash lessons from the first 2^20 attempts are baked in:
        # (1) centroids MUST be a jit ARGUMENT — a closure-captured 1.77 GB
        # device array is embedded as an MLIR constant, and serializing it
        # for the chipless AOT compile helper churns host memory for tens
        # of minutes before killing the helper (the original broken-pipe);
        # (2) top-k is segmented (per-4096-column winners then a top-k over
        # winners — exact) so no single lax.top_k spans 1.15M columns.
        nlist_act = centroids.shape[0]
        seg = 4096
        nseg = (nlist_act + seg - 1) // seg
        pad_cols = nseg * seg - nlist_act
        cents_pad = np.zeros((nseg * seg, centroids.shape[1]), np.float32)
        cents_pad[:nlist_act] = centroids
        cents_dev = jnp.asarray(cents_pad, jnp.bfloat16)
        del cents_pad

        def probe_body(cents, q, np_):
            s = (q.astype(jnp.bfloat16) @ cents.T).astype(jnp.float32)
            if pad_cols:
                s = s.at[:, nlist_act:].set(-np.inf)
            b_ = s.shape[0]
            k1 = min(np_, seg)
            sv, si = jax.lax.top_k(s.reshape(b_ * nseg, seg), k1)
            sv = sv.reshape(b_, nseg * k1)
            si = (si.reshape(b_, nseg, k1)
                  + (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :, None]
                  ).reshape(b_, nseg * k1)
            v2, pos = jax.lax.top_k(sv, np_)
            return jnp.take_along_axis(si, pos, axis=1)

        # amortized probe cost: reps perturbed probes inside ONE jitted
        # fori_loop (the r4 artifact's probe_b1_* printed 0.0 because a
        # single sub-floor dispatch was floor-subtracted then clamped)
        @functools.partial(jax.jit, static_argnums=(2, 3))
        def probe_rep(cents, q, np_, reps):
            def body(i, acc):
                ids = probe_body(cents, q + i.astype(jnp.float32) * 1e-4,
                                 np_)
                return acc + ids.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        qk = np.sort(rng.integers(0, args.n, 64))
        qp = (np.ascontiguousarray(host_codes[qk]).astype(np.float32)
              / DEFAULT_SCALE + DEFAULT_OFFSET)
        for b in (1, 64):
            for np_ in (16, 64):
                qb = jnp.asarray(qp[:b])
                f = functools.partial(probe_rep, cents_dev, qb, np_,
                                      args.reps)
                jax.block_until_ready(f())
                row[f"probe_b{b}_p{np_}_ms"] = round(amortized_ms(
                    lambda: f(), args.reps, floor_ms), 2)
        res["coarse"] = row
        flush()
        print(json.dumps(res))
        return

    # queries: perturbed corpus rows (host memmap read is tiny)
    qids = np.sort(rng.integers(0, args.n, 65))
    qrows = np.ascontiguousarray(host_codes[qids]).astype(np.float32)
    qrows = qrows / DEFAULT_SCALE + DEFAULT_OFFSET
    qrows += 0.05 * rng.normal(size=qrows.shape).astype(np.float32)
    q1, q64 = qrows[:1], qrows[1:]

    # exact ground truth for recall@20 (cached — recomputing it needs the
    # full corpus on device, which resumed runs skip)
    gt_path = cache + ".gt20.npz"
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
        ei1, ei64 = gt["ei1"], gt["ei64"]
    elif codes_dev is None:
        # flat rows cached but no ground-truth sidecar (older run): exact
        # host scan — 65 x 10.5M sgemm is ~15 s of BLAS, far cheaper than
        # re-uploading 8 GB just to recompute 20 ids per query
        print("computing exact ground truth on host ...", flush=True)
        best_s = np.full((65, 20), -np.inf, np.float32)
        best_i = np.zeros((65, 20), np.int64)
        qsum = qrows.sum(1, keepdims=True) * DEFAULT_OFFSET
        for c0 in range(0, args.n, 1 << 20):
            blk = np.ascontiguousarray(
                host_codes[c0:c0 + (1 << 20)]).astype(np.float32)
            s = qrows @ blk.T / DEFAULT_SCALE + qsum
            part = np.argpartition(s, -20, axis=1)[:, -20:]
            cat_s = np.concatenate(
                [best_s, np.take_along_axis(s, part, axis=1)], axis=1)
            cat_i = np.concatenate([best_i, part + c0], axis=1)
            sel = np.argpartition(cat_s, -20, axis=1)[:, -20:]
            best_s = np.take_along_axis(cat_s, sel, axis=1)
            best_i = np.take_along_axis(cat_i, sel, axis=1)
        ei1, ei64 = best_i[:1], best_i[1:]
        np.savez(gt_path, ei1=ei1, ei64=ei64)
    else:
        # ------------- flat exact scan (corpus used in place) -----------
        print("building flat index ...", flush=True)
        flat = FlatIndex(codes_dev, chunk=65536)
        ev1, ei1 = flat.search(q1, top_k=20)
        ev64, ei64 = flat.search(q64, top_k=20)
        np.savez(gt_path, ei1=ei1, ei64=ei64)
        if "flat_b64_ms" not in res:
            res["flat_b1_ms"] = round(1000 * timed(
                lambda: flat.search(q1, top_k=20)), 2)
            res["flat_b64_ms"] = round(1000 * timed(
                lambda: flat.search(q64, top_k=20)), 2)
            res["flat_b64_qps"] = round(64 / (res["flat_b64_ms"] / 1000), 1)
        if "flat_rep_b64_ms" not in res:
            res["flat_rep_b64_ms"] = round(amortized_ms(
                lambda: flat.bench_repeat(q64, top_k=20, reps=args.reps),
                args.reps, floor_ms), 2)
            res["flat_rep_b1_ms"] = round(amortized_ms(
                lambda: flat.bench_repeat(q1, top_k=20, reps=args.reps),
                args.reps, floor_ms), 2)
        print(f"flat: b1 {res['flat_b1_ms']} ms, b64 {res['flat_b64_ms']} "
              f"ms, amortized b64 {res['flat_rep_b64_ms']} ms", flush=True)
        del flat
    res["flat_bytes"] = int(args.n) * int(args.d)
    flush()
    # free the flat device buffers before the IVF goes up (HBM budget)
    del codes_dev
    jax.clear_caches()

    # ---------------- IVF builds (coarse phase shared across quants) ----
    def recall(ids, exact):
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / exact.shape[1]
            for a, b in zip(ids, exact)]))

    coarse_dir = os.path.join(
        args.workdir, f"ivf_scale_coarse_{args.n}x{args.d}_{args.nlist}")

    probes = tuple(int(p) for p in args.probes.split(",") if p.strip())
    for quant in quants:
        qkey = (f"ivf_{quant}" if args.refine_factor is None
                else f"ivf_{quant}_rf{args.refine_factor}")
        # nlist is part of the identity: a 2^20 build must not collide
        # with the default-65536 cache dirs (which keep their old names)
        nl_sfx = "" if args.nlist == 65536 else f"_nl{args.nlist}"
        idx_dir = os.path.join(
            args.workdir, f"ivf_scale_idx_{quant}_{args.n}x{args.d}{nl_sfx}")
        qres = res.get(qkey, {})
        res[qkey] = qres

        print(f"=== {quant} ===", flush=True)
        if (os.path.exists(os.path.join(idx_dir, "save.done"))
                and all("rep_b64_ms" in qres.get(f"p{p}", {})
                        for p in probes)):
            # fully measured: don't pay the multi-GB index upload at all
            print("  all probe rows cached; skipping", flush=True)
            continue
        t0 = time.perf_counter()
        if os.path.exists(os.path.join(idx_dir, "save.done")):
            print(f"loading cached index {idx_dir} ...", flush=True)
            ivf = IVFIndex.load(idx_dir)
            if args.refine_factor is not None:
                ivf.cfg.refine_factor = args.refine_factor
                qres["refine_factor"] = args.refine_factor
        else:
            cfg = IVFConfig(num_clusters=args.nlist, fine_quant=quant,
                            kmeans_iters=6,
                            sample_ratio=min(1.0, 1e6 / args.n),
                            balance_factor=4.0,
                            refine_factor=args.refine_factor or 4)
            ivf = IVFIndex.build(host_codes, cfg, verbose=True,
                                 coarse_cache=coarse_dir)
            qres["build_s"] = round(time.perf_counter() - t0, 1)
            print(f"built in {qres['build_s']}s; saving to {idx_dir} ...",
                  flush=True)
            if os.path.exists(idx_dir):
                shutil.rmtree(idx_dir)
            ivf.save(idx_dir)
            with open(os.path.join(idx_dir, "save.done"), "w") as f:
                f.write("ok\n")
        qres["nlist_actual"] = int(ivf.centroids.shape[0])
        qres["cap"] = int(ivf.cap)
        lens = np.diff(np.asarray(ivf.list_offsets))
        qres["list_mean"] = round(float(lens.mean()), 1)
        qres["list_max"] = int(lens.max())
        qres["code_bytes"] = int(np.asarray(ivf.codes[:1]).dtype.itemsize
                                 * ivf.n_real * ivf.codes.shape[1])
        if ivf.pq_books is not None:
            qres["code_bytes"] += int(np.asarray(ivf.pq_books).nbytes)
            qres["refine"] = ivf.refine_codes is not None
        qres["packed_ok"] = bool(ivf._packed_ok or ivf._pq_block_ok)
        flush()

        for nprobe in probes:
            pkey = f"p{nprobe}"
            if pkey in qres and "rep_b64_ms" in qres[pkey]:
                print(f"  {pkey}: cached {qres[pkey]}", flush=True)
                continue
            _, i1 = ivf.search(q1, top_k=20, nprobe=nprobe)
            _, i64 = ivf.search(q64, top_k=20, nprobe=nprobe)
            ms1 = round(1000 * timed(
                lambda: ivf.search(q1, top_k=20, nprobe=nprobe)), 2)
            ms64 = round(1000 * timed(
                lambda: ivf.search(q64, top_k=20, nprobe=nprobe)), 2)
            ent = {
                "b1_ms": ms1, "b64_ms": ms64,
                "b64_qps": round(64 / (ms64 / 1000), 1),
                "recall20_b1": round(recall(i1, ei1), 4),
                "recall20_b64": round(recall(i64, ei64), 4),
                "rep_b64_ms": round(amortized_ms(
                    lambda: ivf.bench_union_repeat(
                        q64, top_k=20, nprobe=nprobe, reps=args.reps),
                    args.reps, floor_ms), 2),
            }
            qres[pkey] = ent  # flush the packed row before the grouped
            flush()           # probe (which can crash the TPU worker)
            if (ivf._packed_ok or ivf._pq_block_ok) \
                    and not args.no_grouped \
                    and not (ivf.pq_books is not None and nprobe >= 64):
                # PQ grouped scans at nprobe>=64 have crashed the TPU
                # worker EVERY attempt at 10.5M (r4 twice, r5 once — the
                # ~1.6 s single dispatch exceeds the worker's tolerance);
                # the comparison is measured at p16 only.
                # grouped (fixed-cap dynamic_slice) formulation, same
                # probes/candidates semantics modulo the union superset —
                # the read-amplification comparison. The grouped PQ scan
                # can be ~10x slower than the block scan; a 16-rep
                # fori-loop at nprobe>=64 then exceeds the TPU worker's
                # single-dispatch tolerance and CRASHES the chip (seen
                # twice at 10.5M/OPQ96/p64) — size reps to a wall budget
                # from a 1-rep probe first.
                g1_ms = 1000.0 * timed(
                    lambda: ivf.bench_union_repeat(
                        q64, top_k=20, nprobe=nprobe, reps=1, packed=False),
                    n_rep=1, warmup=1)
                greps = max(2, min(args.reps, int(
                    args.grouped_budget_ms / max(g1_ms, 1e-3))))
                if g1_ms * greps <= 1.5 * args.grouped_budget_ms:
                    ent["rep_b64_ms_grouped"] = round(amortized_ms(
                        lambda: ivf.bench_union_repeat(
                            q64, top_k=20, nprobe=nprobe, reps=greps,
                            packed=False),
                        greps, floor_ms), 2)
                    if greps != args.reps:
                        ent["grouped_reps"] = greps
                else:
                    ent["grouped_skipped_1rep_ms"] = round(g1_ms, 2)
            qres[pkey] = ent
            print(f"  nprobe={nprobe}: {ent}", flush=True)
            flush()

        del ivf
        jax.clear_caches()

    print(json.dumps(res))


if __name__ == "__main__":
    main()
