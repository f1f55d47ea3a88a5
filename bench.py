#!/usr/bin/env python
"""End-to-end vamp benchmark (BASELINE.json configs 1-5).

Measures the full pipeline on real hardware: encode -> build_mask ->
coarse vamp (12 steps) -> coarse-to-fine (2 steps, windowed-as-batch) ->
codec decode, with the app's default batch_size=2 variations on 10 s of audio
at the shipped model scale (coarse 20L/20H/1280d 4cb, c2f 16L 14cb,
codec 44.1kHz hop-512 14cb). Weights are random — throughput is
weight-independent.

Metric: audio seconds generated per wall-clock second per chip.
vs_baseline: ratio against the driver's north star (10x realtime per chip,
BASELINE.json; the reference publishes no numbers — BASELINE.md).

TIMEOUT-PROOF EMISSION (round-4): the single-stream headline JSON line is
printed and flushed the moment it is measured; every later stage re-prints
the full JSON as a SUPERSET line (same headline fields, richer detail), so
a driver that takes either the first or the last JSON line gets a valid
result even if a later stage is killed. Optional stages are gated on a
wall-clock budget (env VAMPNET_BENCH_BUDGET_S, default 2400) with cold/warm
compile-cost estimates; skipped stages are recorded in detail["skipped"].

Env knobs:
  VAMPNET_BENCH_BUDGET_S   wall-clock budget in seconds (default 2400)
  VAMPNET_BENCH_SERVE=0    skip the serving stage
  VAMPNET_BENCH_SMOKE=1    tiny models + short audio on CPU (CI smoke test
                           of the emission/budget logic, not a perf number)
  VAMPNET_JAX_CACHE        persistent compile-cache dir (default .jax_cache)
  VAMPNET_BENCH_ONLY_DS=1  skip every optional stage except device_split —
                           cache-warming mode for the chained differential,
                           the remote-compile service's biggest and least
                           reliable program (pair with VAMPNET_DS_ATTEMPTS
                           and a large budget; a success lands in the
                           persistent cache, after which normal runs hit it
                           warm)
  VAMPNET_DS_ATTEMPTS      device_split compile attempts (default 2)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("VAMPNET_BENCH_SMOKE", "0") == "1"


# recorded on v5e (round 3). The fused sampler's pltpu PRNG stream is
# deterministic per platform/compiler; drift here means the PRODUCTION
# token stream changed — bump deliberately only with a sampling-semantics
# change in the same commit. "__RECORD__" prints the digest instead.
SAMPLER_GOLDEN_DIGEST = "c549cd9265dcf21c"


def _log(msg):
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _sampler_golden_check():
    """TPU-side regression gate for ops/sampler_kernel.py (fused sampler)."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from vampnet_tpu.ops.sampler_kernel import fused_sample_from_logits
    from vampnet_tpu.sampling.sample import sample_from_logits

    b, flat, v = 2, 864, 1024
    logits = (
        jax.random.normal(jax.random.PRNGKey(7), (b, flat, v), jnp.float32) * 3.0
    )
    keys = jnp.asarray(np.array([[11, 22], [33, 44]], np.uint32))

    @jax.jit
    def run(keys, logits):
        toks, probs = fused_sample_from_logits(
            keys, 3, logits, 1.0, True,
            typical_filtering=True, typical_mass=0.15, typical_min_tokens=64,
        )
        # no-RNG path: argmax through the same fused filters
        greedy, _ = fused_sample_from_logits(
            keys, 3, logits, 1.0, False,
            typical_filtering=True, typical_mass=0.15, typical_min_tokens=64,
        )
        return toks, greedy

    toks, greedy = run(keys, logits)
    digest = hashlib.sha256(
        np.asarray(toks).astype(np.int32).tobytes()
    ).hexdigest()

    # deterministic cross-check: fused greedy == xla greedy, exactly
    xla_greedy = sample_from_logits(
        jax.random.PRNGKey(0), logits, sample=False, temperature=1.0,
        typical_filtering=True, typical_mass=0.15, typical_min_tokens=64,
    )
    greedy_ok = bool(np.array_equal(np.asarray(greedy), np.asarray(xla_greedy)))

    out = {"digest": digest[:16], "greedy_matches_xla": greedy_ok}
    if SAMPLER_GOLDEN_DIGEST == "__RECORD__":
        out["ok"] = greedy_ok
        out["recorded"] = True
    else:
        out["ok"] = greedy_ok and digest[:16] == SAMPLER_GOLDEN_DIGEST
    return out


def build_iface():
    """The benchmark model stack at full shipped scale (random weights —
    throughput is weight-independent). Shared with scratch/bench_e2e_* so
    surgery numbers always measure bench.py's exact configuration."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vampnet_tpu.codec import LAC, CodecConfig
    from vampnet_tpu.interface import Interface
    from vampnet_tpu.modules import LMConfig, VampNetLM

    codec_cfg = CodecConfig()  # 44.1 kHz, hop 512, 14 codebooks
    coarse_cfg = LMConfig.coarse()
    c2f_cfg = LMConfig.c2f()
    if SMOKE:
        codec_cfg = CodecConfig(encoder_dim=8, decoder_dim=16, n_codebooks=6)
        tiny = dict(n_heads=2, n_layers=2, embedding_dim=64)
        coarse_cfg = dataclasses.replace(
            coarse_cfg, n_codebooks=4, **tiny
        )
        c2f_cfg = dataclasses.replace(
            c2f_cfg, n_codebooks=6, n_conditioning_codebooks=4, **tiny
        )

    def _host_fill(shapes, seed):
        # weights are random and throughput is weight-independent: build the
        # param tree from eval_shape on the HOST instead of jitting init on
        # the device — a cold run saves ~2 min of remote compiles and the
        # init programs never enter the persistent cache
        rng = np.random.default_rng(seed)
        return jax.tree.map(
            lambda s: (
                jnp.asarray(rng.standard_normal(s.shape, np.float32) * 0.02)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jnp.zeros(s.shape, s.dtype)
            ),
            shapes,
        )

    codec = LAC(codec_cfg)
    audio0 = jnp.zeros((1, codec_cfg.hop_length * 4, 1), jnp.float32)
    codec_params = _host_fill(
        jax.eval_shape(codec.init, jax.random.PRNGKey(0), audio0)["params"], 0
    )

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim), jnp.float32)
        shapes = jax.eval_shape(
            lambda k: model.init(k, codes, cbs, method="forward_codes"),
            jax.random.PRNGKey(seed),
        )["params"]
        return _host_fill(shapes, seed)

    chunks = dict(coarse_chunk_size_s=2, coarse2fine_chunk_size_s=1) if SMOKE else {}
    return codec_cfg, Interface.from_modules(
        codec_cfg=codec_cfg,
        codec_params=codec_params,
        coarse_cfg=coarse_cfg,
        coarse_params=init_lm(coarse_cfg, 1),
        c2f_cfg=c2f_cfg,
        c2f_params=init_lm(c2f_cfg, 2),
        **chunks,
    )


def make_sig(codec_cfg, seconds=10.0):
    """The benchmark input signal (two detuned partials + noise)."""
    from vampnet_tpu.audio import AudioSignal

    sr = codec_cfg.sample_rate
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 110 * t)
        + 0.2 * np.sin(2 * np.pi * 220 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.05 * np.random.default_rng(0).standard_normal(len(t))
    ).astype(np.float32)
    return AudioSignal(wav[None, None, :], sr)


def make_stage_loops(iface):
    """Chained-differential measurers for the three device stages of a vamp
    request: coarse MaskGIT, c2f MaskGIT, codec encode+decode. Each stage is
    one jitted program whose body feeds itself under a dynamic-trip
    fori_loop, so the N_hi/N_lo marginal is pure device time (CLAUDE.md
    measurement rule). Shared by bench.py's device_split FALLBACK and
    scratch/bench_longform_attrib.py so both produce the SAME persistent
    cache entries — a successful run of either warms the other.

    Returns (coarse, c2f, codec): coarse(nb, steps=12) / c2f(nb, steps=2) /
    codec(seconds, dec_b) -> device seconds per iteration."""
    import jax
    import jax.numpy as jnp

    def _differential(run, args, lo=1, hi=3, reps=2):
        def wall(n):
            np.asarray(run(*args, jnp.int32(n)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(run(*args, jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            return best

        return max(0.0, (wall(hi) - wall(lo)) / (hi - lo))

    # CRITICAL: model params must enter each chained program as explicit jit
    # ARGUMENTS. Closed-over params reach the outer trace as constants and
    # get materialized into the StableHLO as dense literals — the coarse
    # loop's module measured 1.27 GB of IR vs 0.3 MB param-explicit
    # (scratch/probe_payload_size.py), and the remote-compile service
    # rejects the body (HTTP 413 / broken pipe). This was the real cause of
    # every r4/r5 chained-compile failure.
    def _lm_loop(which, lm, m, z, key0, steps):
        gen = iface._gen_fn(
            which, lm, sampling_steps=steps, typical_filtering=True,
            typical_mass=0.15, typical_min_tokens=64, top_k=None,
            use_top_p=False, cfg_guidance=None, sampler_impl="auto",
        )
        cbs = (
            lm.codebooks if lm.codebooks is not None
            else iface._codebooks[: lm.n_codebooks]
        )
        f32 = jnp.float32

        @jax.jit
        def run(params, cbs, z, key, iters):
            def body(i, zz):
                return gen(
                    params, cbs, jax.random.fold_in(key, i),
                    jnp.where(m.astype(bool), lm.mask_token, zz), m,
                    f32(1.0), f32(10.5), f32(0.0), f32(1.0),
                )

            return jax.lax.fori_loop(0, iters, body, z).sum()

        return _differential(run, (lm.params, cbs, z, key0))

    def coarse(nb, steps=12):
        lm = iface.coarse
        t_len = iface.s2t(lm.chunk_size_s)
        z = jnp.zeros((nb, lm.n_codebooks, t_len), jnp.int32)
        m = jnp.ones_like(z)
        return _lm_loop("coarse", lm, m, z, jax.random.PRNGKey(0), steps)

    def c2f(nb, steps=2):
        lm = iface.c2f
        f_len = iface.s2t(lm.chunk_size_s)
        ncc = lm.n_conditioning_codebooks
        z = jnp.zeros((nb, lm.n_codebooks, f_len), jnp.int32)
        m = jnp.concatenate(
            [
                jnp.zeros((nb, ncc, f_len), jnp.int32),
                jnp.ones((nb, lm.n_codebooks - ncc, f_len), jnp.int32),
            ],
            axis=1,
        )
        return _lm_loop("c2f", lm, m, z, jax.random.PRNGKey(1), steps)

    def codec(seconds, dec_b=2):
        sig = make_sig(iface.codec_config, seconds)
        audio = jnp.asarray(iface._preprocess(sig).samples.transpose(0, 2, 1))

        @jax.jit
        def run(cp, a, iters):
            def body(i, aa):
                codes = iface._encode_jit(cp, aa)  # encode at b=1 (production)
                codes_b = jnp.tile(codes, (dec_b, 1, 1))  # decode at batch
                wav = iface._decode_jit(cp, codes_b)
                return jnp.clip(wav[0:1, : aa.shape[1]], -1.0, 1.0)

            return jax.lax.fori_loop(0, iters, body, a).sum()

        return _differential(run, (iface.codec_params, audio))

    return coarse, c2f, codec


def _seed_cache(cache_dir, seed=None):
    """Populate the (gitignored) runtime compile cache from the COMMITTED
    seed directory `.jax_cache_seed/` — the bench's exact program working
    set, captured by scripts/refresh_bench_cache.py. A driver run on a fresh
    clone then starts warm (~1 min to the headline) instead of paying
    ~25-45 min of remote compiles; round 3's only deliverable gap was a
    bench timeout from exactly that cold start. Hardlink when possible."""
    import shutil

    if seed is None:
        seed = os.path.join(os.path.dirname(__file__), ".jax_cache_seed")
    if not os.path.isdir(seed):
        return
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in os.listdir(seed):
        src, dst = os.path.join(seed, name), os.path.join(cache_dir, name)
        if not os.path.exists(dst):
            # copy, never hardlink: the source is a git-tracked file, and a
            # shared inode would let runtime utime/rewrites of the cache
            # entry silently mutate the committed seed (advisor r4)
            shutil.copy2(src, dst)
            n += 1
    if n:
        _log(f"seeded {n} compile-cache entries from .jax_cache_seed/")


def main():
    import jax

    if SMOKE:
        # set the platform BEFORE any other jax.config call and verify the
        # switch took: if it failed (backend already initialized) a "CI
        # smoke" run would silently dispatch minutes of remote compiles to
        # the axon tunnel before failing much later (advisor r4)
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", (
            f"SMOKE requested but backend is {jax.default_backend()!r} — "
            "refusing to smoke-run against real hardware"
        )

    # persistent compilation cache: fresh processes reuse prior XLA/Mosaic
    # compiles (the remote-compile path costs minutes per large program)
    cache_dir = os.environ.get(
        "VAMPNET_JAX_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    _seed_cache(cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    # Default sized for the COLD path: the e2e warmup alone is ~1,070 s of
    # remote compiles when the committed seed is missing/stale, and the old
    # 900 s default then mathematically skipped every optional stage
    # (BENCH_r04). 2,400 s lets a cold run still deliver sampler_golden +
    # serving (+ hot_swap); the warm seeded path finishes in well under
    # 900 s regardless. Worst case under a shorter driver timeout equals the
    # old behavior: every stage's JSON is already on the wire when killed.
    budget = float(os.environ.get("VAMPNET_BENCH_BUDGET_S", "2400"))

    def remaining():
        return budget - (time.monotonic() - _T0)

    codec_cfg, iface = build_iface()
    seconds = 1.0 if SMOKE else 10.0
    batch_size = 2  # app default (reference app.py:232)
    sig = make_sig(codec_cfg, seconds)

    def run(seed):
        # single-dispatch path: encode -> mask -> coarse -> c2f -> decode is
        # ONE device program; only the waveform crosses back to the host.
        # PCM16 on the host link (half the bytes of fp32, ~35 ms of the p50
        # through the tunnel): lossless w.r.t. what users receive — the
        # output is written as 16-bit WAV (AudioSignal.write) either way.
        out = iface.vamp_e2e(
            sig, batch_size=batch_size, seed=seed,
            periodic_prompt=7, upper_codebook_mask=3, _sampling_steps=12,
            transfer_dtype="int16",
        )
        out.samples.sum()  # host sync
        return out

    # ---------------- stage 1 (mandatory): single-stream ----------------
    _log("single-stream: compiling e2e program")
    t_c0 = time.monotonic()
    run(0)  # warmup / compile
    compile_s = time.monotonic() - t_c0
    cold = (
        compile_s > 90.0
        or os.environ.get("VAMPNET_BENCH_FORCE_COLD", "0") == "1"  # tests
    )  # warm cache hit is seconds; a cold remote
    # compile of the e2e program is minutes — use this to estimate the
    # cold-compile cost of every later optional stage
    _log(f"single-stream: warmup took {compile_s:.1f}s (cold={cold})")
    times = []
    for i in range(2 if SMOKE else 6):  # median-of-6: tunnel variance +-10-15%
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = seconds * batch_size
    value = audio_sec / p50

    detail = {
        "p50_vamp_latency_s": round(p50, 3),
        "audio_seconds": audio_sec,
        "batch_size": batch_size,
        "coarse_steps": 12,
        "c2f_steps": 2,
        "n_runs": len(times),
        "transfer_dtype": "int16",
        "backend": jax.default_backend(),
        "warmup_compile_s": round(compile_s, 1),
        "skipped": [],
    }
    if SMOKE:
        detail["smoke"] = True
    result = {
        "metric": "audio_sec_generated_per_wall_sec_per_chip",
        "value": round(value, 3),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / 10.0, 3),
        "detail": detail,
    }

    def emit():
        detail["elapsed_s"] = round(time.monotonic() - _T0, 1)
        print(json.dumps(result), flush=True)

    emit()  # the headline is on the wire before any optional stage runs

    # snapshot the single-stream e2e program NOW: later stages (long_form's
    # b=1 60 s call) add their own vamp_e2e entries to the cache, and the
    # device-split stage must chain the exact program measured above
    e2e_fns = [f for k, f in iface._gen_cache.items() if k[0] == "vamp_e2e"]

    only_ds = os.environ.get("VAMPNET_BENCH_ONLY_DS", "0") == "1"

    def gate(name, warm_est, cold_est):
        """Budget gate for an optional stage: False -> recorded as skipped."""
        if only_ds and not name.startswith("device_split"):
            detail["skipped"].append({"stage": name, "reason": "only_ds"})
            _log(f"SKIP {name}: VAMPNET_BENCH_ONLY_DS")
            return False
        est = cold_est if cold else warm_est
        if remaining() < est:
            detail["skipped"].append(
                {"stage": name, "est_s": est, "remaining_s": round(remaining(), 1)}
            )
            _log(f"SKIP {name}: est {est}s > remaining {remaining():.0f}s")
            return False
        _log(f"stage {name} (est {est}s, remaining {remaining():.0f}s)")
        return True

    # ---- device-program vs tunnel split (bench honesty; runs LAST) ----
    # CHAINED differential: run the very e2e program measured above as
    # dependent iterations inside ONE jitted fori_loop (output variation 0
    # feeds the next iteration's input; DYNAMIC trip count so one compile
    # serves both ends). Marginal per iteration = pure device e2e time —
    # the only method that survives tunnel weather (CLAUDE.md measurement
    # rule; a staged/async-marginal method double-counts the ~69 ms/call
    # waveform transfer and per-stage dispatch RPCs as device).
    # Runs LAST (called after long_form below): the chained compile is the
    # bench's most expensive step — and was its least reliable until r5
    # found the closed-over-params payload bug (see make_stage_loops) — so
    # it must never starve the cheap stages of budget.
    def device_split_stage():
        # FALLBACK FIRST (r5): three small chained programs (coarse MaskGIT,
        # c2f MaskGIT, codec roundtrip) land a per-stage device split in the
        # artifact before the bigger exact-chain compile is attempted. Each
        # part is independent — a failed compile drops that part only.
        if gate("device_split_fallback", 120, 900):
            import math

            t_tok = int(iface.s2t(seconds))
            f_len = int(iface.s2t(iface.c2f.chunk_size_s))
            c_len = int(iface.s2t(iface.coarse.chunk_size_s))
            nb_coarse = math.ceil(t_tok / c_len) * batch_size
            nb_c2f = math.ceil(t_tok / f_len) * batch_size
            coarse_m, c2f_m, codec_m = make_stage_loops(iface)
            parts = {}
            for part, fn_args in (
                ("coarse", lambda: coarse_m(nb_coarse)),
                ("c2f", lambda: c2f_m(nb_c2f)),
                ("codec", lambda: codec_m(seconds, dec_b=batch_size)),
            ):
                try:
                    parts[part] = round(fn_args(), 3)
                except Exception as e:
                    _log(f"device_split_fallback[{part}] failed: {e!r}")
            if parts:
                detail["device_program_parts_s"] = parts
                if len(parts) == 3:
                    total = round(sum(parts.values()), 3)
                    detail["device_program_sum_s"] = total
                    detail["device_split_method"] = (
                        "stage_sum (coarse+c2f+codec chained differentials; "
                        "excludes inter-stage glue)"
                    )
                    detail["tunnel_host_overhead_s"] = round(p50 - total, 3)
            emit()

        # exact chain second: if it succeeds, device_program_s supersedes the
        # stage sum. Warmness can't be detected before tracing, so the gate
        # keys on a marker that rides the seed-collection cycle: a successful
        # chain run touches `.e2e_chain_ok` in the runtime cache, the
        # refresh script's fresh-atime collect carries it into the committed
        # seed next to the chain's cache entry, and its presence in the SEED
        # means a fresh clone hits the chain warm (est 520 s). Without it, a
        # cold attempt costs an e2e-class remote compile (~6-10 min — the
        # historical ~25-28 min broken-pipe attempts were the closed-over-
        # params payload bug, fixed: params are explicit args now), so the
        # gate demands 900 s; the stage-sum above has already delivered
        # device numbers either way.
        marker = os.path.join(
            os.path.dirname(__file__), ".jax_cache_seed", ".e2e_chain_ok"
        )
        chain_est = 520 if os.path.exists(marker) else 900
        if not gate("device_split", chain_est, chain_est):
            return
        try:
            fn = e2e_fns[-1]
            audio_np = np.asarray(
                iface._preprocess(sig).samples
            ).transpose(0, 2, 1)
            # the bench e2e program runs transfer_dtype="int16": its input
            # arg is PCM16, so the chain carry must be PCM16 too
            audio_np = np.round(
                np.clip(audio_np, -1.0, 1.0) * 32767.0
            ).astype(np.int16)
            audio_dev = jnp.asarray(audio_np)
            params_ = (
                iface.codec_params, iface.coarse.params, iface.c2f.params,
                iface._codebooks,
            )

            # params as explicit jit ARGS — closed over, they materialize as
            # dense IR literals (a ~1.3 GB module, scratch/
            # probe_payload_size.py) and the remote-compile service rejects
            # the body; this was the r4/r5 "broken pipe / HTTP 413" cause
            @jax.jit
            def chained(ps, audio, key, iters):
                cp_, co_, c2_, cb_ = ps

                def body(i, a):
                    wav = fn(
                        cp_, co_, c2_, cb_, a, jax.random.fold_in(key, i),
                        jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
                        jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
                        jnp.float32(1.0),
                    )
                    if wav.dtype == jnp.int16:  # PCM16-transfer program variant
                        wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
                    wav = jnp.clip(wav[0:1], -1.0, 1.0)
                    if a.dtype == jnp.int16:  # match the carry to the input
                        wav = jnp.round(wav * 32767.0).astype(jnp.int16)
                    return wav

                out = jax.lax.fori_loop(0, iters, body, audio)
                return jnp.sum(out.astype(jnp.float32))

            key_ = jax.random.PRNGKey(3)

            def wall_iters(n, reps=2):
                np.asarray(chained(params_, audio_dev, key_, jnp.int32(n)))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(chained(params_, audio_dev, key_, jnp.int32(n)))
                    best = min(best, time.perf_counter() - t0)
                return best

            # one retry: the remote-compile service drops connections under
            # load (round-4 observed "Broken pipe" mid-compile) — transient,
            # and the partial compile is cached so the retry is cheaper
            last_err = None
            n_attempts = int(os.environ.get("VAMPNET_DS_ATTEMPTS", "2"))
            for attempt in range(n_attempts):
                try:
                    w1, w4 = wall_iters(1), wall_iters(4)
                    break
                except Exception as e:
                    last_err = e
                    _log(f"device_split attempt {attempt} failed: {e!r}")
                    # a failed attempt means the chained program was NOT a
                    # warm cache hit: the retry pays cold-compile time
                    # regardless of the `cold` flag, so gate it on the
                    # realistic cold e2e-class compile cost
                    if remaining() < 700:
                        raise
                    if attempt + 1 < n_attempts:
                        time.sleep(45)  # let the remote-compile service drain
            else:
                raise last_err
            device_program_s = max(0.0, (w4 - w1) / 3)
            # chained-differential device compute of the exact e2e program;
            # the rest of p50 is tunnel RPC + waveform transfer + host
            # preprocess — round-over-round single-stream deltas should be
            # judged on THIS
            detail["device_program_s"] = round(device_program_s, 3)
            detail["tunnel_host_overhead_s"] = round(p50 - device_program_s, 3)
            # chain proved warm/compilable here: touch the runtime marker so
            # the refresh script's fresh-atime collect commits it alongside
            # the chain's cache entry (see chain_est above). TPU only — a
            # CPU smoke chain says nothing about the remote-compile path.
            # utime explicitly: a plain re-write of a pre-existing marker
            # updates mtime but NOT atime, and the refresh collect keys on
            # atime (this exact miss dropped the marker once).
            if jax.default_backend() == "tpu":
                try:
                    mpath = os.path.join(cache_dir, ".e2e_chain_ok")
                    with open(mpath, "w") as f:
                        f.write("chained e2e differential compiled+ran ok\n")
                    os.utime(mpath, None)
                except OSError:
                    pass
        except Exception as e:
            _log(f"device_split failed: {e!r}")
        emit()

    # ---- stage 3: fused Pallas sampler token-regression gate ----
    # The production sampler (ops/sampler_kernel.py) has its OWN pltpu PRNG
    # stream that the CPU suite can never execute; pin its token stream on
    # TPU with a recorded golden, and check the no-RNG path (do_sample=False)
    # against the xla sampler exactly.
    if jax.default_backend() == "tpu" and gate("sampler_golden", 45, 150):
        try:
            sampler_golden = _sampler_golden_check()
            detail["sampler_golden"] = sampler_golden
            if not sampler_golden.get("ok", True):
                _log(f"SAMPLER GOLDEN DRIFT: {sampler_golden}")
        except Exception as e:
            _log(f"sampler_golden failed: {e!r}")
        emit()

    # ---- stage 4: serving throughput (BASELINE.json config 5) ----
    # 16 concurrent 10 s requests through the continuous-batching engine
    if os.environ.get("VAMPNET_BENCH_SERVE", "1") != "0" and gate(
        "serving", 150, 700
    ):
        try:
            from vampnet_tpu.serve import VampEngine, VampRequest

            n_req, max_batch = (4, 2) if SMOKE else (16, 8)
            codes = np.asarray(iface.encode(sig))
            mask = np.asarray(iface.build_mask(jnp.asarray(codes), seed=0))
            eng = VampEngine(iface, max_batch=max_batch, max_wait_ms=30.0)

            def serve_round(n, seed0):
                futs = [
                    eng.submit(VampRequest(codes=codes, mask=mask, seed=seed0 + i))
                    for i in range(n)
                ]
                for f in futs:
                    f.result(timeout=3600)

            serve_round(max_batch, 100)  # warmup/compile the batch programs
            # two measured rounds: the SECOND (fully steady-state, index
            # chosen before seeing values) is the headline — same single-shot
            # definition as every prior recorded round — and both are kept in
            # detail so tunnel weather is visible
            serve_walls = []
            for round_i in range(2):
                t0 = time.perf_counter()
                serve_round(n_req, 200 + 100 * round_i)
                serve_walls.append(time.perf_counter() - t0)
            detail["serving_audio_s_per_s_per_chip"] = round(
                n_req * seconds / serve_walls[-1], 3
            )
            detail["serving_rounds"] = [
                round(n_req * seconds / w, 3) for w in serve_walls
            ]
            detail["serving_config"] = (
                f"{n_req} concurrent {seconds:g}s requests, max_batch={max_batch}"
            )
            # throughput-optimal operating point (r5 sweep: conc=2*max_batch
            # clears the conc=16 point by ~3% at 2x the p50 latency; see
            # docs/PERF.md "Round-5"). Same compiled batch programs — the
            # engine still buckets at max_batch — so this round is cheap.
            t0 = time.perf_counter()
            serve_round(2 * n_req, 500)
            detail["serving_conc32_audio_s_per_s_per_chip"] = round(
                2 * n_req * seconds / (time.perf_counter() - t0), 3
            )
            eng.close()
            # the engine contract is tokens (decode is the caller's stage —
            # the webapp decodes per response); the single-stream p50 above
            # DOES include codec encode+decode
            detail["serving_scope"] = "coarse+c2f token generation (no decode)"
        except Exception as e:
            _log(f"serving failed: {e!r}")
        emit()

    # ---- stage 5: LoRA/model hot-swap latency (BASELINE config 4a) ----
    # Reference counterpart: interface.load_finetuned/reload
    # (interface.py:134-174) — torch.load from disk + lenient overlay. Here:
    # .vtpu load from disk + param upload; same-architecture swaps reuse
    # every compiled program (params are traced arguments), so the first
    # vamp after the swap is expected at steady-state p50, not a recompile.
    if gate("hot_swap", 120, 150):
        try:
            import tempfile

            from vampnet_tpu.checkpoints import save_lm

            with tempfile.TemporaryDirectory() as td:
                swap_path = os.path.join(td, "coarse_swap.vtpu")
                save_lm(swap_path, iface.coarse.config, iface.coarse.params)
                t0 = time.perf_counter()
                iface.reload(coarse_ckpt=swap_path)
                jax.block_until_ready(iface.coarse.params)
                t_reload = time.perf_counter() - t0
                t0 = time.perf_counter()
                run(99)
                t_first = time.perf_counter() - t0
            detail["hot_swap_reload_s"] = round(t_reload, 3)
            detail["hot_swap_first_vamp_s"] = round(t_first, 3)
            detail["hot_swap_reused_programs"] = bool(t_first < 3 * p50 + 2.0)
        except Exception as e:
            _log(f"hot_swap failed: {e!r}")
        emit()

    # ---- stage 6: long-form generation (BASELINE config 4b) ----
    # One 60 s request, batch_size=1 (the unloop/long-form regime):
    # windowed chunks ride as a batch dim inside ONE e2e program
    # (reference: the serial 10 s chunk loop, interface.py:397-441).
    if gate("long_form", 90, 520):
        try:
            long_s = 3.0 if SMOKE else 60.0
            sig_long = make_sig(codec_cfg, long_s)

            def run_long(seed):
                out = iface.vamp_e2e(
                    sig_long, batch_size=1, seed=seed,
                    periodic_prompt=7, upper_codebook_mask=3,
                    _sampling_steps=12, transfer_dtype="int16",
                )
                out.samples.sum()
                return out

            run_long(0)  # warmup/compile
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                run_long(i + 1)
                walls.append(time.perf_counter() - t0)
            lf_p50 = float(np.median(walls))
            detail["long_form_seconds"] = long_s
            detail["long_form_p50_s"] = round(lf_p50, 3)
            detail["long_form_audio_s_per_s"] = round(long_s / lf_p50, 3)
        except Exception as e:
            _log(f"long_form failed: {e!r}")
        emit()

    device_split_stage()

    # final superset line: carries the complete skipped-stage record even
    # when every optional stage was budget-gated away
    emit()
    _log("done")


if __name__ == "__main__":
    main()
