"""Honest device time for the single-stream vamp_e2e program.

v1 tried p50-of-6 differentials across step counts through the tunnel —
worthless: run-to-run tunnel weather (+-10%) exceeds the 6-step delta, and
the async-marginal staged method counts per-iteration waveform transfers
(~69 ms) and dispatch RPCs as "device" time. v1's reliable findings:
trivial round-trip ~32 ms, fp32->int16 transfer delta ~34 ms.

v2 (this): the ONLY trustworthy method on this backend — dependent
iterations inside ONE jitted program (CLAUDE.md measurement rule). The e2e
program maps audio (1,T,1) -> waveforms (2,T,1); feed variation 0 back as
the next input under a lax.fori_loop with a DYNAMIC trip count (one compile
serves N_lo and N_hi). Marginal per iteration = pure device e2e time.

Run: python scratch/bench_e2e_surgery.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench_e2e_common import build_iface, make_sig  # noqa: E402

ITERS_LO, ITERS_HI = 1, int(os.environ.get("ITERS_HI", 6))


def main():
    print("backend:", jax.default_backend(), flush=True)
    codec_cfg, iface = build_iface()
    sig = make_sig(codec_cfg)

    # compile + cache the production e2e program (bench.py's exact config)
    iface.vamp_e2e(
        sig, batch_size=2, seed=0, periodic_prompt=7, upper_codebook_mask=3,
        _sampling_steps=12, c2f_steps=2,
    )
    assert len(iface._gen_cache) == 1
    fn = next(iter(iface._gen_cache.values()))
    audio = jnp.asarray(iface._preprocess(sig).samples.transpose(0, 2, 1))
    print("audio:", audio.shape, flush=True)

    cp, co, c2, cb = (
        iface.codec_params, iface.coarse.params, iface.c2f.params,
        iface._codebooks,
    )

    @jax.jit
    def chained(audio, key, iters):
        def body(i, a):
            wav = fn(
                cp, co, c2, cb, a, jax.random.fold_in(key, i),
                jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
                jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
                jnp.float32(1.0),
            )
            return jnp.clip(wav[0:1], -1.0, 1.0)

        out = jax.lax.fori_loop(0, iters, body, audio)
        return jnp.sum(out.astype(jnp.float32))

    key = jax.random.PRNGKey(3)

    def wall(iters, n=4):
        np.asarray(chained(audio, key, jnp.int32(iters)))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(chained(audio, key, jnp.int32(iters)))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = wall(ITERS_LO), wall(ITERS_HI)
    ms = (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3
    print(f"chained e2e device time: {ms:.1f} ms/iteration "
          f"(lo {lo*1e3:.0f} ms, hi {hi*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
