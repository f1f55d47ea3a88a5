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

    from vampnet_tpu.audio import AudioSignal
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

    iface = Interface.from_modules(
        codec_cfg=codec_cfg,
        codec_params=codec_params,
        coarse_cfg=coarse_cfg,
        coarse_params=init_lm(coarse_cfg, 1),
        c2f_cfg=c2f_cfg,
        c2f_params=init_lm(c2f_cfg, 2),
    )

    seconds = 10.0
    batch_size = 2  # app default (reference app.py:232)
    sr = codec_cfg.sample_rate
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 110 * t)
        + 0.2 * np.sin(2 * np.pi * 220 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.05 * np.random.default_rng(0).standard_normal(len(t))
    ).astype(np.float32)
    sig = AudioSignal(wav[None, None, :], sr)

    def run(seed):
        # single-dispatch path: encode -> mask -> coarse -> c2f -> decode is
        # ONE device program; only the waveform crosses back to the host
        out = iface.vamp_e2e(
            sig, batch_size=batch_size, seed=seed,
            periodic_prompt=7, upper_codebook_mask=3, _sampling_steps=12,
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
            t0 = time.perf_counter()
            serve_round(16, 200)
            serve_wall = time.perf_counter() - t0
            serving = round(16 * seconds / serve_wall, 3)
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
        "backend": jax.default_backend(),
    }
    if serving is not None:
        detail["serving_audio_s_per_s_per_chip"] = serving
        detail["serving_config"] = "16 concurrent 10s requests, max_batch=8"
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
