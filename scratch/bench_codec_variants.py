"""Measure the codec conv-impl variants on TPU (trimmed from
bench_e2e_attrib.py — session 3 built the knobs but the tunnel died before
they were measured).

Chained-differential per-call device time for:
  encode b=1 / decode b=2 at the e2e shapes,
  encode b=8 at the train-batch shape,
for (conv_impl, compute_dtype) in
  (xla, fp32) [baseline], (matmul, fp32), (matmul, bf16), (xla, bf16).

Decode-only bodies under compute_dtype=bf16 measure exactly the
decoder_compute_dtype knob (encode never runs in a decode body).

Run on TPU: python scratch/bench_codec_variants.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_iface, make_sig  # noqa: E402
from vampnet_tpu.codec import LAC  # noqa: E402

codec_cfg, iface = build_iface()
sig = make_sig(codec_cfg, 10.0)
BATCH = 2
cp = iface.codec_params


def diff(make_body, x0, lo=2, hi=8, reps=2):
    # ONE jitted dynamic-trip program serves both iteration counts (ADVICE
    # r3: building prog inside the timer compiled the identical program
    # twice per variant through the ~13 s/op remote-compile service)
    @jax.jit
    def prog(x, iters):
        return jax.lax.fori_loop(0, iters, make_body, x)

    def wall(n):
        out = prog(x0, jnp.int32(n))
        jax.tree_util.tree_map(np.asarray, out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = prog(x0, jnp.int32(n))
            jax.tree_util.tree_map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(hi) - wall(lo)) / (hi - lo)


t_samples = int(10.0 * codec_cfg.sample_rate)
t_samples -= t_samples % codec_cfg.hop_length
audio0 = jnp.asarray(sig.samples[:, :t_samples, :])
audio8 = jnp.tile(audio0, (8, 1, 1))
codes0 = jnp.tile(jnp.asarray(iface.encode(sig)), (BATCH, 1, 1))

results = {}
for impl, dt in (
    ("xla", "float32"),
    ("matmul", "float32"),
    ("matmul", "bfloat16"),
    ("xla", "bfloat16"),
):
    cfg_v = dataclasses.replace(codec_cfg, conv_impl=impl, compute_dtype=dt)
    codec_v = LAC(cfg_v)

    def enc_v(i, a, _m=codec_v):
        codes = _m.apply({"params": cp}, a, method="encode")["codes"]
        bump = jnp.where(codes[0, 0, 0] > 10**9, 1.0, 0.0)
        return a + bump

    def dec_v(i, c, _m=codec_v):
        wav = _m.apply({"params": cp}, c, method="decode_codes")
        bump = jnp.where(wav[0, 0, 0] > 2.0, 1, 0)  # tanh out <= 1: always 0
        return c + bump

    tag = f"{impl}_{dt}"
    results[f"encode_b1_{tag}"] = diff(enc_v, audio0)
    print(f"encode b=1 [{tag}]: {results[f'encode_b1_{tag}']*1e3:.2f} ms", flush=True)
    results[f"encode_b8_{tag}"] = diff(enc_v, audio8)
    print(f"encode b=8 [{tag}]: {results[f'encode_b8_{tag}']*1e3:.2f} ms", flush=True)
    results[f"decode_b{BATCH}_{tag}"] = diff(dec_v, codes0)
    print(f"decode b={BATCH} [{tag}]: {results[f'decode_b{BATCH}_{tag}']*1e3:.2f} ms", flush=True)

print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
