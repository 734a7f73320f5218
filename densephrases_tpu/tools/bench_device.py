"""On-device serving/training microbench.

Every number is timed with a per-call VALUE fetch (see synced_time: this
tunnel's block_until_ready is unreliable and queued programs serialize
pathologically), then the separately-measured trivial-dispatch round-trip
floor is subtracted — the result estimates pure device time per call.
Also reports train-step MFU from XLA's own flop count.

Run: python densephrases_tpu/tools/bench_device.py [--out docs/DEVICE_BENCH.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# v5e-class chip: 197 bf16 TFLOP/s. Overridable for other chips.
PEAK_TFLOPS = float(os.environ.get("DPH_PEAK_TFLOPS", "197"))


def synced_time(dispatch, k: int = 8, warmup: int = 3):
    """Seconds per call, synchronized by a VALUE fetch per call.

    On this tunnel ``block_until_ready`` can return before execution and
    multiple queued programs serialize pathologically, so async
    pipeline timing under-reports wildly; fetching a scalar from each
    call's output is the only sync that cannot lie. The number therefore
    INCLUDES one host round-trip — subtract ``roundtrip_floor`` for an
    estimate of pure device time."""
    import jax

    def leaf(out):
        x = out
        while isinstance(x, (tuple, list, dict)):
            x = next(iter(x.values())) if isinstance(x, dict) else x[0]
        return jax.device_get(x).ravel()[0]

    for _ in range(warmup):
        leaf(dispatch())
    t0 = time.perf_counter()
    for _ in range(k):
        leaf(dispatch())
    return (time.perf_counter() - t0) / k


def roundtrip_floor(k: int = 12):
    """Per-call cost of a trivial dispatch + value fetch (tunnel RTT)."""
    import jax
    import jax.numpy as jnp

    one = jnp.ones((8, 8))
    f = jax.jit(lambda x: x + 1.0)
    for _ in range(3):
        jax.device_get(f(one))[0, 0]
    t0 = time.perf_counter()
    for _ in range(k):
        jax.device_get(f(one))[0, 0]
    return (time.perf_counter() - t0) / k


def repeat_ms(run_fn, reps: int, floor_s: float, n_rep: int = 3) -> float:
    """Per-iteration ms of a fori-loop bench callable: one dispatch + one
    value fetch amortized over ``reps`` device iterations — the only
    timing this tunnel cannot distort for sub-10-ms programs. The
    callable must return a scalar whose value depends on every
    iteration (CSE/hoist guard)."""
    float(run_fn())  # compile + warm
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        float(run_fn())
        ts.append(time.perf_counter() - t0)
    return max(1000.0 * (float(np.median(ts)) - floor_s), 1e-3) / reps


def xla_flops(jitted, *args) -> float:
    """XLA's flop estimate for one call (0.0 if unavailable)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "DEVICE_BENCH.json"))
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny encoder + small shapes: CPU smoke test of "
                         "the harness itself, not a measurement")
    ap.add_argument("--only", default=None,
                    help="comma subset of {encode,scan,fused,train,tuned,"
                         "parity}: "
                         "re-measure just those sections, merging into an "
                         "existing --out JSON (tunnel time is scarce; a "
                         "config change shouldn't force a full re-run). "
                         "NOTE: the dispatch floor is re-measured on every "
                         "run, so merged files mix sections floor-subtracted "
                         "against slightly different floors — each section "
                         "records the floor it was measured against as "
                         "<section>_floor_ms.")
    args = ap.parse_args()
    all_sections = {"encode", "scan", "fused", "train", "tuned",
                    "parity"}
    sections = (set(args.only.split(",")) if args.only else all_sections)
    unknown = sections - all_sections
    if unknown:
        ap.error(f"--only: unknown section(s) {sorted(unknown)}; "
                 f"valid: {sorted(all_sections)}")

    def want(s):
        return s in sections

    import jax
    import jax.numpy as jnp

    from densephrases_tpu.index.flat import FlatIndex, _scan_topk
    from densephrases_tpu.models.bert import BertConfig
    from densephrases_tpu.models.encoder import (
        RCLossConfig,
        embed_query,
        init_encoder_params,
    )
    from densephrases_tpu.ops.quant import float_to_int8

    res = {}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            res = json.load(f)
    # the scan/fused corpus is padded up to the 65536 chunk size; record the
    # PADDED n unconditionally (even when scan/fused sections are skipped in
    # an --only merge) so bandwidth derived as n*dim/t from the artifact is
    # always consistent with the corpus the scan keys were measured over
    n_pad = ((args.n + 65535) // 65536) * 65536
    res.update({"backend": jax.default_backend(), "n": n_pad,
                "batch": args.batch, "peak_tflops": PEAK_TFLOPS})
    res["roundtrip_floor_ms"] = round(1000 * roundtrip_floor(), 2)
    floor = res["roundtrip_floor_ms"] / 1000.0
    for s in sections:  # each section records the floor it was run against
        res[f"{s}_floor_ms"] = res["roundtrip_floor_ms"]
    config = BertConfig.tiny(vocab_size=1000) if args.tiny else BertConfig()
    dim = config.hidden_size
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    b, lq = args.batch, 32

    # shared inputs (cheap; used by encode/fused sections)
    ids = jnp.asarray(rng.integers(5, 1000, (b, lq)), jnp.int32)
    mask = jnp.ones((b, lq), jnp.int32)
    reps = 20
    # bf16-resident weights = the serving configuration (serve_dtype).
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    # analytic encode flops: 2 towers, fwd-only, 6 GEMMs/layer
    p_enc_fwd = 12 * (4 * config.hidden_size ** 2 +
                      2 * config.hidden_size * config.intermediate_size)
    enc_flops = 2.0 * p_enc_fwd * (2 * b * lq)

    # ---- query encoding (both towers, stacked)
    if want("encode"):
        enc = jax.jit(lambda p, i, m: embed_query(p, config, i, m,
                                                  deterministic=True))
        t = max(synced_time(lambda: enc(params, ids, mask)) - floor, 1e-6)
        fl = xla_flops(enc, params, ids, mask)
        res["encode_b%d_ms" % b] = round(1000 * t, 3)
        res["encode_mfu"] = (round(fl / t / (PEAK_TFLOPS * 1e12), 4)
                             if fl else None)

        # amortized: per-call value-fetch timing is RTT-noise-bounded below
        # ~10 ms; a fori_loop amortizes one round trip over `reps` iters.
        @jax.jit
        def enc_rep(p, i, m):
            def body(it, acc):
                qs, _qe = embed_query(p, config, jnp.roll(i, it, axis=0), m,
                                      deterministic=True)
                return acc + qs.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        res["encode_rep_b%d_ms" % b] = round(repeat_ms(
            lambda: enc_rep(params, ids, mask), reps, floor), 3)
        res["encode_rep_bf16_b%d_ms" % b] = round(repeat_ms(
            lambda: enc_rep(params_bf16, ids, mask), reps, floor), 3)
        t_rep = res["encode_rep_bf16_b%d_ms" % b] / 1000.0
        res["encode_rep_mfu"] = round(
            enc_flops / t_rep / (PEAK_TFLOPS * 1e12), 4)

    # ---- stage-1 flat scan over n x 768 int8
    # corpus generated ON DEVICE (host-side numpy normal() takes minutes on
    # this VM's single slow core) and chunk-aligned so FlatIndex uses the
    # device buffer in place
    flat = None
    if want("scan") or want("fused"):
        codes = float_to_int8(
            jax.random.normal(jax.random.PRNGKey(7), (n_pad, dim),
                              jnp.float32) - 2.0)
        args.n = n_pad
        flat = FlatIndex(codes, chunk=65536)
        q = jnp.asarray(rng.normal(size=(2 * b, dim)), jnp.float32)
        # NOTE: codes must be an explicit ARGUMENT — a jit closing over the
        # device corpus embeds it as an HLO constant, and the serialized
        # program blows the remote-compile transport (HTTP 413)
        nvalid = jnp.int32(args.n)

    if want("scan"):
        def scan(q_):
            return _scan_topk(q_, flat.codes, nvalid, flat.offset,
                              flat.scale, top_k=10, chunk=flat.chunk)

        t = max(synced_time(lambda: scan(q)) - floor, 1e-6)
        res["scan_2x%d_ms" % b] = round(1000 * t, 3)
        res["scan_gbps"] = round(args.n * dim / t / 1e9, 1)

        # amortized flat scan (the Pallas flat-scan kernels were retired
        # after losing this harness 4x to the XLA formulation — the
        # measured decision record lives in ARCHITECTURE.md section 8)
        ms = repeat_ms(lambda: flat.bench_repeat(q, top_k=10, reps=reps),
                       reps, floor)
        res["scan_rep_xla_ms"] = round(ms, 3)
        res["scan_rep_xla_gbps"] = round(
            args.n * dim / (ms / 1000.0) / 1e9, 1)

    # ---- fused serve step (encode + scan + rescore, one dispatch)
    if want("fused"):
        from densephrases_tpu.serve.fused import _fused_serve

        f2o = jnp.asarray(np.arange(args.n) % 100, jnp.int32)
        doc_end = jnp.asarray((np.arange(args.n) // 100 + 1) * 100,
                              jnp.int32)
        doc_base = jnp.asarray((np.arange(args.n) // 100) * 100, jnp.int32)
        tts = jnp.zeros((b, lq), jnp.int32)

        def fused():
            return _fused_serve(
                params, ids, mask, tts, flat.codes, f2o, doc_end, doc_base,
                jnp.float32(flat.offset), jnp.float32(flat.scale),
                jnp.int32(args.n), config=config, top_k=10,
                max_answer_length=10, chunk=flat.chunk, attn_impl="auto")

        t = max(synced_time(fused) - floor, 1e-6)
        res["fused_b%d_ms" % b] = round(1000 * t, 3)
        res["fused_qps_device"] = round(b / t, 1)

        # amortized fused step (bf16-resident weights = serve config).
        # EVERY corpus-sized array (codes AND f2o/doc_end/doc_base) is a
        # jit argument — see the NOTE above on closure-captured constants
        @jax.jit
        def fused_rep(p, i, codes_, f2o_, doc_end_, doc_base_):
            def body(it, acc):
                out = _fused_serve(
                    p, jnp.roll(i, it, axis=0), mask, tts, codes_, f2o_,
                    doc_end_, doc_base_, jnp.float32(flat.offset),
                    jnp.float32(flat.scale),
                    jnp.int32(args.n), config=config, top_k=10,
                    max_answer_length=10, chunk=flat.chunk,
                    attn_impl="auto")
                res_, _s, _e = out
                leaf = jax.tree.leaves(res_)[0]
                return acc + leaf.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        ms = repeat_ms(lambda: fused_rep(params_bf16, ids, flat.codes,
                                         f2o, doc_end, doc_base),
                       reps, floor)
        res["fused_rep_b%d_ms" % b] = round(ms, 3)
        res["fused_rep_qps_device"] = round(b / (ms / 1000.0), 1)
        del f2o, doc_end, doc_base

    # ---- RC train step MFU (b24, L384 — the reference's training shape)
    # free the serve-bench corpus + jit caches first: the remat=none
    # variant needs the HBM the scan benches were holding
    if flat is not None:
        del flat, codes
    jax.clear_caches()
    if not (want("train") or want("tuned") or want("parity")):
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res))
        return

    from densephrases_tpu.train.rc import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    bt, l = (4, 128) if args.tiny else (24, 384)
    opt = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=100)
    state = create_train_state(params, opt, pbn_size=2, batch_size=bt,
                               hidden=config.hidden_size)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 1000, (bt, l)), jnp.int32),
        "attention_mask": jnp.ones((bt, l), jnp.int32),
        "token_type_ids": jnp.zeros((bt, l), jnp.int32),
        "query_input_ids": jnp.asarray(rng.integers(5, 1000, (bt, lq)),
                                       jnp.int32),
        "query_attention_mask": jnp.ones((bt, lq), jnp.int32),
        "query_token_type_ids": jnp.zeros((bt, lq), jnp.int32),
        "start_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)),
                                       jnp.int32),
        "end_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)),
                                     jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    # Analytic model flops: XLA's cost_analysis under-reports on this
    # backend (~10x). 6 * tokens * encoder-params over the three towers
    # (fwd+bwd), embeddings excluded. MFU always divides by the MODEL
    # flops (the remat-free program's count) — recompute is overhead,
    # not useful work.
    p_enc = 12 * (4 * config.hidden_size ** 2 +
                  2 * config.hidden_size * config.intermediate_size)
    fl_model = 6.0 * p_enc * (bt * l + 2 * bt * lq)
    # remat sweep: at BERT-base b24/L384 activations fit in HBM, so "none"
    # skips the recompute FLOPs "full" pays.
    for remat in (("full", "dots", "none") if want("train") else ()):  # safest first: a late OOM cannot poison earlier numbers
        suffix = "" if remat == "full" else f"_{remat}"
        step = make_train_step(config, RCLossConfig(lambda_neg=1.0,
                                                    lambda_flt=1.0), opt,
                               remat=remat)
        try:
            new_state, metrics = step(state, batch, key)  # compile
            float(jax.device_get(metrics["loss"]))
            t0 = time.perf_counter()
            k = 6
            for _ in range(k):
                new_state, metrics = step(new_state, batch, key)
                float(jax.device_get(metrics["loss"]))  # value-fetch sync
            t = max((time.perf_counter() - t0) / k - floor, 1e-6)
        except Exception as e:  # e.g. HBM OOM on the no-remat variant
            res[f"train_step_ms{suffix}"] = None
            res[f"train_error{suffix}"] = f"{type(e).__name__}: {e}"[:160]
            jax.clear_caches()
            continue
        res[f"train_step_ms{suffix}"] = round(1000 * t, 1)
        res[f"train_mfu{suffix}"] = round(
            fl_model / t / (PEAK_TFLOPS * 1e12), 4)

        # amortized: thread the state through a fori_loop (same batch,
        # per-iteration dropout rng) — one dispatch, one fetch
        k_rep = 8

        @jax.jit
        def train_rep(st, bt_, ky):
            def body(i, carry):
                s_, acc = carry
                s2, m = step(s_, bt_, jax.random.fold_in(ky, i))
                return (s2, acc + m["loss"])
            return jax.lax.fori_loop(0, k_rep, body,
                                     (st, jnp.float32(0)))[1]

        try:
            ms_rep = repeat_ms(lambda: train_rep(state, batch, key),
                               k_rep, floor, n_rep=2)
            res[f"train_rep_ms{suffix}"] = round(ms_rep, 1)
            res[f"train_rep_mfu{suffix}"] = round(
                fl_model / (ms_rep / 1000.0) / (PEAK_TFLOPS * 1e12), 4)
        except Exception as e:
            res[f"train_rep_error{suffix}"] = f"{type(e).__name__}: {e}"[:160]
            jax.clear_caches()

    # ---- tuned TPU-native training config: remat=dots + gelu_tanh +
    # rbg dropout keys — the train-CLI defaults for from-scratch training
    # (TrainOptions.hidden_act/rng_impl). The remat sweep above keeps the
    # HF-parity activation (exact erf) and threefry keys; TRAIN_ABLATE.json
    # attributes the individual deltas.
    if want("tuned"):
        import dataclasses

        cfg_tuned = dataclasses.replace(config, hidden_act="gelu_tanh")
        step_tuned = make_train_step(
            cfg_tuned, RCLossConfig(lambda_neg=1.0, lambda_flt=1.0), opt,
            remat="dots")
        key_rbg = jax.random.key(0, impl="rbg")
        k_rep = 8

        @jax.jit
        def train_rep_tuned(st, bt_, ky):
            def body(i, carry):
                s_, acc = carry
                s2, m = step_tuned(s_, bt_, jax.random.fold_in(ky, i))
                return (s2, acc + m["loss"])
            return jax.lax.fori_loop(0, k_rep, body,
                                     (st, jnp.float32(0)))[1]

        try:
            ms_rep = repeat_ms(
                lambda: train_rep_tuned(state, batch, key_rbg),
                k_rep, floor, n_rep=2)
            res["train_rep_ms_tuned"] = round(ms_rep, 1)
            res["train_rep_mfu_tuned"] = round(
                fl_model / (ms_rep / 1000.0) / (PEAK_TFLOPS * 1e12), 4)
        except Exception as e:
            res["train_rep_error_tuned"] = f"{type(e).__name__}: {e}"[:160]

    # ---- parity training config AS THE CLI RUNS IT: exact-erf gelu (HF
    # golden parity preserved) + remat=dots + rbg dropout keys + the
    # uint8-lane dropout masks (models/bert._dropout) — the VERDICT-r3
    # target is >= 0.25 MFU here WITHOUT giving up activation parity.
    if want("parity"):
        step_par = make_train_step(
            config, RCLossConfig(lambda_neg=1.0, lambda_flt=1.0), opt,
            remat="dots")
        key_rbg2 = jax.random.key(1, impl="rbg")
        k_rep = 8

        @jax.jit
        def train_rep_parity(st, bt_, ky):
            def body(i, carry):
                s_, acc = carry
                s2, m = step_par(s_, bt_, jax.random.fold_in(ky, i))
                return (s2, acc + m["loss"])
            return jax.lax.fori_loop(0, k_rep, body,
                                     (st, jnp.float32(0)))[1]

        try:
            ms_rep = repeat_ms(
                lambda: train_rep_parity(state, batch, key_rbg2),
                k_rep, floor, n_rep=2)
            res["train_rep_ms_parity"] = round(ms_rep, 1)
            res["train_rep_mfu_parity"] = round(
                fl_model / (ms_rep / 1000.0) / (PEAK_TFLOPS * 1e12), 4)
            res["parity_floor_ms"] = round(floor, 2)
        except Exception as e:
            res["train_rep_error_parity"] = f"{type(e).__name__}: {e}"[:160]

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
