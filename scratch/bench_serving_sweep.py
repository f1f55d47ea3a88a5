"""Serving roofline r3 (VERDICT item 4): re-derive the device ceiling with
the whole-seq kernels and sweep VampEngine(max_batch) past 8.

Part 1 — stage device costs at request-batch N in {8, 16, 32} via
async-marginal timing: dispatch M dependent-free repeats of the SAME
compiled stage program, sync once; the marginal per-call wall is the device
program time (the ~150 ms tunnel RPC pipelines away).

Part 2 — VampEngine throughput under C concurrent 10 s requests for
max_batch in {8, 16, 32}, C in {16, 32}.

Run: python scratch/bench_serving_sweep.py  (real TPU; keep .jax_cache)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM

SECONDS = 10.0
# r5: grids env-configurable — VERDICT item 5 needs only {8,16}x{16,32}
BATCHES = tuple(int(x) for x in os.environ.get("BENCH_BATCHES", "8,16,32").split(","))
CONCS = tuple(int(x) for x in os.environ.get("BENCH_CONCS", "16,32").split(","))
PART1 = os.environ.get("BENCH_PART1", "1") == "1"


def build_iface():
    codec_cfg = CodecConfig()
    coarse_cfg = LMConfig.coarse()
    c2f_cfg = LMConfig.c2f()
    codec = LAC(codec_cfg)
    audio0 = jnp.zeros((1, codec_cfg.hop_length * 4, 1), jnp.float32)
    codec_params = jax.jit(lambda k: codec.init(k, audio0))(jax.random.PRNGKey(0))["params"]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim), jnp.float32)
        return jax.jit(lambda k: model.init(k, codes, cbs, method="forward_codes"))(
            jax.random.PRNGKey(seed)
        )["params"]

    return Interface.from_modules(
        codec_cfg=codec_cfg, codec_params=codec_params,
        coarse_cfg=coarse_cfg, coarse_params=init_lm(coarse_cfg, 1),
        c2f_cfg=c2f_cfg, c2f_params=init_lm(c2f_cfg, 2),
    ), codec_cfg


def main():
    print("backend:", jax.default_backend())
    iface, codec_cfg = build_iface()
    sr = codec_cfg.sample_rate
    t = np.arange(int(SECONDS * sr)) / sr
    wav = (0.4 * np.sin(2 * np.pi * 110 * t)).astype(np.float32)
    sig = AudioSignal(wav[None, None, :], sr)
    codes1 = np.asarray(iface.encode(sig))
    mask1 = np.asarray(iface.build_mask(jnp.asarray(codes1), seed=0))

    # ---- part 1: stage device costs ----
    def two_stage(codes, mask, seeds):
        zc = iface.coarse_vamp(
            jnp.asarray(codes), jnp.asarray(mask), seed=seeds, _sampling_steps=12
        )
        return iface.coarse_to_fine(
            zc, mask=jnp.asarray(mask), seed=seeds + 7, _sampling_steps=2
        )

    for n in BATCHES if PART1 else ():
        codes = np.repeat(codes1, n, axis=0)
        mask = np.repeat(mask1, n, axis=0)
        seeds = np.arange(n, dtype=np.uint32)
        out = two_stage(codes, mask, seeds)  # compile
        np.asarray(out)

        def run_m(m):
            t0 = time.perf_counter()
            outs = [two_stage(codes, mask, seeds + 13 * i) for i in range(m)]
            for o in outs:
                np.asarray(o)
            return time.perf_counter() - t0

        w1 = min(run_m(1) for _ in range(2))
        w4 = min(run_m(4) for _ in range(2))
        marginal = (w4 - w1) / 3
        ceiling = n * SECONDS / marginal
        print(
            f"[batchN] n={n}: wall1={w1:.3f}s wall4={w4:.3f}s "
            f"device/prog~{marginal:.3f}s ceiling~{ceiling:.1f} audio_s/s/chip",
            flush=True,
        )

    # ---- part 2: engine sweep ----
    from vampnet_tpu.serve import VampEngine, VampRequest

    for max_batch in BATCHES:
        eng = VampEngine(iface, max_batch=max_batch, max_wait_ms=30.0)

        def serve_round(n_req, seed0):
            futs = [
                eng.submit(VampRequest(codes=codes1, mask=mask1, seed=seed0 + i))
                for i in range(n_req)
            ]
            for f in futs:
                f.result(timeout=3600)

        serve_round(max_batch, 1000)  # warm/compile this batch size
        for conc in CONCS:
            serve_round(conc, 2000)  # steady-state warm
            t0 = time.perf_counter()
            serve_round(conc, 3000 + conc)
            wall = time.perf_counter() - t0
            print(
                f"[engine] max_batch={max_batch} conc={conc}: "
                f"{conc * SECONDS / wall:.1f} audio_s/s/chip ({wall:.2f}s)",
                flush=True,
            )
        eng.close()


if __name__ == "__main__":
    main()
