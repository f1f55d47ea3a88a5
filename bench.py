#!/usr/bin/env python
"""End-to-end vamp benchmark (BASELINE.json configs 1-3).

Measures the full pipeline on real hardware: encode -> build_mask ->
coarse vamp (12 steps) -> coarse-to-fine (2 steps, windowed-as-batch) ->
codec decode, with the app's default batch_size=2 variations on 10 s of audio
at the shipped model scale (coarse 20L/20H/1280d 4cb, c2f 16L 14cb,
codec 44.1kHz hop-512 14cb). Weights are random — throughput is
weight-independent.

Metric: audio seconds generated per wall-clock second per chip.
vs_baseline: ratio against the driver's north star (10x realtime per chip,
BASELINE.json; the reference publishes no numbers — BASELINE.md).

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np


# recorded on v5e (round 3). The fused sampler's pltpu PRNG stream is
# deterministic per platform/compiler; drift here means the PRODUCTION
# token stream changed — bump deliberately only with a sampling-semantics
# change in the same commit. "__RECORD__" prints the digest instead.
SAMPLER_GOLDEN_DIGEST = "c549cd9265dcf21c"


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
    import jax
    import jax.numpy as jnp

    from vampnet_tpu.codec import LAC, CodecConfig
    from vampnet_tpu.interface import Interface
    from vampnet_tpu.modules import LMConfig, VampNetLM

    codec_cfg = CodecConfig()  # 44.1 kHz, hop 512, 14 codebooks
    coarse_cfg = LMConfig.coarse()
    c2f_cfg = LMConfig.c2f()

    codec = LAC(codec_cfg)
    audio0 = jnp.zeros((1, codec_cfg.hop_length * 4, 1), jnp.float32)
    codec_params = jax.jit(lambda k: codec.init(k, audio0))(jax.random.PRNGKey(0))[
        "params"
    ]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim), jnp.float32)
        return jax.jit(
            lambda k: model.init(k, codes, cbs, method="forward_codes")
        )(jax.random.PRNGKey(seed))["params"]

    return codec_cfg, Interface.from_modules(
        codec_cfg=codec_cfg,
        codec_params=codec_params,
        coarse_cfg=coarse_cfg,
        coarse_params=init_lm(coarse_cfg, 1),
        c2f_cfg=c2f_cfg,
        c2f_params=init_lm(c2f_cfg, 2),
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


def main():
    import os

    import jax

    # persistent compilation cache: fresh processes reuse prior XLA/Mosaic
    # compiles (the remote-compile path costs minutes per large program)
    cache_dir = os.environ.get(
        "VAMPNET_JAX_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    codec_cfg, iface = build_iface()
    seconds = 10.0
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

    run(0)  # warmup / compile
    times = []
    for i in range(6):  # median-of-6: tunnel variance is +-10-15%
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = seconds * batch_size
    value = audio_sec / p50

    # ---- device-program vs tunnel split (round-3 bench honesty) ----
    # CHAINED differential: run the very e2e program measured above as
    # dependent iterations inside ONE jitted fori_loop (output variation 0
    # feeds the next iteration's input; DYNAMIC trip count so one compile
    # serves both ends). Marginal per iteration = pure device e2e time —
    # the only method that survives tunnel weather (CLAUDE.md measurement
    # rule; the previous async-marginal staged method double-counted the
    # ~69 ms/call waveform transfer and per-stage dispatch RPCs as device).
    device_program_s = None
    try:
        fn = [f for k, f in iface._gen_cache.items() if k[0] == "vamp_e2e"][-1]
        audio_dev = jnp.asarray(iface._preprocess(sig).samples.transpose(0, 2, 1))
        cp_, co_, c2_, cb_ = (
            iface.codec_params, iface.coarse.params, iface.c2f.params,
            iface._codebooks,
        )

        @jax.jit
        def chained(audio, key, iters):
            def body(i, a):
                wav = fn(
                    cp_, co_, c2_, cb_, a, jax.random.fold_in(key, i),
                    jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
                    jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
                    jnp.float32(1.0),
                )
                if wav.dtype == jnp.int16:  # PCM16-transfer program variant
                    wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
                return jnp.clip(wav[0:1], -1.0, 1.0)

            out = jax.lax.fori_loop(0, iters, body, audio)
            return jnp.sum(out.astype(jnp.float32))

        key_ = jax.random.PRNGKey(3)

        def wall_iters(n, reps=2):
            np.asarray(chained(audio_dev, key_, jnp.int32(n)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(chained(audio_dev, key_, jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            return best

        w1, w4 = wall_iters(1), wall_iters(4)
        device_program_s = max(0.0, (w4 - w1) / 3)
    except Exception:
        device_program_s = None

    # ---- fused Pallas sampler token-regression gate ----
    # The production sampler (ops/sampler_kernel.py) has its OWN pltpu PRNG
    # stream that the CPU suite can never execute; pin its token stream on
    # TPU with a recorded golden, and check the no-RNG path (do_sample=False)
    # against the xla sampler exactly.
    sampler_golden = None
    if jax.default_backend() == "tpu":
        sampler_golden = _sampler_golden_check()
        if not sampler_golden.get("ok", True):
            import sys as _sys

            print(
                f"SAMPLER GOLDEN DRIFT: {sampler_golden}", file=_sys.stderr
            )

    # serving throughput (BASELINE.json config 5): 16 concurrent 10 s
    # requests through the continuous-batching engine
    serving = None
    if os.environ.get("VAMPNET_BENCH_SERVE", "1") != "0":
        try:
            from vampnet_tpu.serve import VampEngine, VampRequest

            codes = np.asarray(iface.encode(sig))
            mask = np.asarray(iface.build_mask(jnp.asarray(codes), seed=0))
            eng = VampEngine(iface, max_batch=8, max_wait_ms=30.0)

            def serve_round(n_req, seed0):
                futs = [
                    eng.submit(VampRequest(codes=codes, mask=mask, seed=seed0 + i))
                    for i in range(n_req)
                ]
                for f in futs:
                    f.result(timeout=3600)

            serve_round(8, 100)  # warmup/compile the batch-8 programs
            # two measured rounds: the SECOND (fully steady-state, index
            # chosen before seeing values) is the headline — same single-shot
            # definition as every prior recorded round — and both are kept in
            # detail so tunnel weather is visible
            serve_walls = []
            for round_i in range(2):
                t0 = time.perf_counter()
                serve_round(16, 200 + 100 * round_i)
                serve_walls.append(time.perf_counter() - t0)
            serving = round(16 * seconds / serve_walls[-1], 3)
            serving_rounds = [round(16 * seconds / w, 3) for w in serve_walls]
            eng.close()
        except Exception:
            serving = None

    detail = {
        "p50_vamp_latency_s": round(p50, 3),
        "audio_seconds": audio_sec,
        "batch_size": batch_size,
        "coarse_steps": 12,
        "c2f_steps": 2,
        "n_runs": len(times),
        "transfer_dtype": "int16",
        "backend": jax.default_backend(),
    }
    if device_program_s is not None:
        # chained-differential device compute of the exact e2e program; the
        # rest of p50 is tunnel RPC + waveform transfer + host preprocess —
        # round-over-round single-stream deltas should be judged on THIS
        detail["device_program_s"] = round(device_program_s, 3)
        detail["tunnel_host_overhead_s"] = round(p50 - device_program_s, 3)
    if sampler_golden is not None:
        detail["sampler_golden"] = sampler_golden
    if serving is not None:
        detail["serving_audio_s_per_s_per_chip"] = serving
        detail["serving_rounds"] = serving_rounds
        detail["serving_config"] = "16 concurrent 10s requests, max_batch=8"
        # the engine contract is tokens (decode is the caller's stage — the
        # webapp decodes per response); the single-stream p50 above DOES
        # include codec encode+decode
        detail["serving_scope"] = "coarse+c2f token generation (no decode)"
    print(
        json.dumps(
            {
                "metric": "audio_sec_generated_per_wall_sec_per_chip",
                "value": round(value, 3),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(value / 10.0, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
