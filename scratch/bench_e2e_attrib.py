"""Attribute the chained-differential e2e device time to its stages.

The single-stream bench's device_program_s (~0.4 s for 2x10 s) is far above
the sum of the known stage costs (coarse 12 x ~11 ms + c2f 2 x ~10 ms); this
script splits it with the same CHAINED differential method (dependent
iterations of one jitted program; marginal per iteration = device time):

  * e2e at coarse steps 12 vs 24  -> coarse per-step cost
  * e2e at c2f steps 2 vs 6       -> c2f per-step cost
  * codec encode+decode roundtrip -> codec cost (the chained body feeds the
    decoded waveform back into encode)
  * decode-only / encode-only     -> split the roundtrip

Run on TPU: python scratch/bench_e2e_attrib.py
"""
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

codec_cfg, iface = build_iface()
sig = make_sig(codec_cfg, 10.0)
BATCH = 2


def chained_wall(make_body, x0, n, reps=2):
    """Wall time of n dependent iterations of make_body inside one program."""

    @jax.jit
    def prog(x, iters):
        return jax.lax.fori_loop(0, iters, make_body, x)

    out = prog(x0, jnp.int32(n))
    jax.tree_util.tree_map(np.asarray, out)  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = prog(x0, jnp.int32(n))
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def diff(make_body, x0, lo=1, hi=4):
    wl, wh = chained_wall(make_body, x0, lo), chained_wall(make_body, x0, hi)
    return (wh - wl) / (hi - lo)


def e2e_body(coarse_steps, c2f_steps):
    """One full vamp_e2e program as a chained body (output feeds input)."""
    # trigger the build + grab the cached callable
    iface.vamp_e2e(
        sig, batch_size=BATCH, seed=0, periodic_prompt=7,
        upper_codebook_mask=3, _sampling_steps=coarse_steps,
        c2f_steps=c2f_steps,
    )
    # static layout: index 9 = _sampling_steps, 10 = c2f_steps (interface.py)
    key = [
        k for k in iface._gen_cache
        if isinstance(k, tuple) and k[0] == "vamp_e2e"
        and k[9] == coarse_steps and k[10] == c2f_steps
    ][-1]
    fn = iface._gen_cache[key]
    cp_, co_, c2_, cb_ = (
        iface.codec_params, iface.coarse.params, iface.c2f.params,
        iface._codebooks,
    )
    kk = jax.random.PRNGKey(3)

    def body(i, a):
        wav = fn(
            cp_, co_, c2_, cb_, a, jax.random.fold_in(kk, i),
            jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
            jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
            jnp.float32(1.0),
        )
        return jnp.clip(wav[0:1], -1.0, 1.0)

    return body


audio0 = jnp.asarray(iface._preprocess(sig).samples.transpose(0, 2, 1))
codec = iface.codec_model
cp = iface.codec_params
t_tokens = audio0.shape[1] // codec_cfg.hop_length

results = {}

# ---- codec roundtrip (b=1 encode -> b=1 decode) ----
def codec_body(i, a):
    codes = codec.apply({"params": cp}, a, method="encode")["codes"]
    wav = codec.apply({"params": cp}, codes, method="decode_codes")
    return jnp.clip(wav[:, : audio0.shape[1]], -1.0, 1.0)

results["codec_roundtrip_b1"] = diff(codec_body, audio0)
print("codec encode+decode b=1:", results["codec_roundtrip_b1"])

# ---- encode only (data-dependent perturbation keeps iterations serial) ----
def enc_body(i, a):
    codes = codec.apply({"params": cp}, a, method="encode")["codes"]
    bump = jnp.where(codes[0, 0, 0] > 10**9, 1.0, 0.0)  # always 0 at runtime
    return a + bump

results["encode_b1"] = diff(enc_body, audio0)
print("encode b=1:", results["encode_b1"])

# ---- encode at the training batch shape (the train benches' fori_loops
# have loop-invariant audio, so XLA hoists encode OUT of the measured loop:
# recorded train-step numbers exclude this cost entirely) ----
audio8 = jnp.tile(audio0, (8, 1, 1))
results["encode_b8"] = diff(enc_body, audio8)
print("encode b=8 (train batch):", results["encode_b8"])

# ---- decode only at the e2e shape (b=BATCH variations) ----
codes0 = jnp.tile(
    jnp.asarray(iface.encode(sig))[:, :, :t_tokens], (BATCH, 1, 1)
)

def dec_body(i, c):
    wav = codec.apply({"params": cp}, c, method="decode_codes")
    bump = jnp.where(wav[0, 0, 0] > 2.0, 1, 0)  # tanh output <= 1: always 0
    return c + bump

results[f"decode_b{BATCH}"] = diff(dec_body, codes0)
print(f"decode b={BATCH}:", results[f"decode_b{BATCH}"])

# ---- codec conv-impl variants (xla vs matmul schedule, fp32 vs bf16) ----
import dataclasses
from vampnet_tpu.codec import LAC

for impl, dt in (("matmul", "float32"), ("matmul", "bfloat16"),
                 ("xla", "bfloat16")):
    cfg_v = dataclasses.replace(codec_cfg, conv_impl=impl, compute_dtype=dt)
    codec_v = LAC(cfg_v)

    def enc_v(i, a, _m=codec_v):
        codes = _m.apply({"params": cp}, a, method="encode")["codes"]
        bump = jnp.where(codes[0, 0, 0] > 10**9, 1.0, 0.0)
        return a + bump

    def dec_v(i, c, _m=codec_v):
        wav = _m.apply({"params": cp}, c, method="decode_codes")
        bump = jnp.where(wav[0, 0, 0] > 2.0, 1, 0)
        return c + bump

    tag = f"{impl}_{dt}"
    results[f"encode_b1_{tag}"] = diff(enc_v, audio0)
    print(f"encode b=1 [{tag}]:", results[f"encode_b1_{tag}"])
    results[f"decode_b{BATCH}_{tag}"] = diff(dec_v, codes0)
    print(f"decode b={BATCH} [{tag}]:", results[f"decode_b{BATCH}_{tag}"])

# ---- e2e at varying step counts ----
e2e12 = diff(e2e_body(12, 2), audio0)
results["e2e_12_2"] = e2e12
print("e2e coarse12 c2f2:", e2e12)

e2e24 = diff(e2e_body(24, 2), audio0)
results["e2e_24_2"] = e2e24
print("e2e coarse24 c2f2:", e2e24)

e2e12_6 = diff(e2e_body(12, 6), audio0)
results["e2e_12_6"] = e2e12_6
print("e2e coarse12 c2f6:", e2e12_6)

coarse_per_step = (e2e24 - e2e12) / 12
c2f_per_step = (e2e12_6 - e2e12) / 4
coarse_total = coarse_per_step * 12
c2f_total = c2f_per_step * 2
print()
print(f"coarse/step {coarse_per_step*1e3:.2f} ms -> 12 steps {coarse_total*1e3:.1f} ms")
print(f"c2f/step    {c2f_per_step*1e3:.2f} ms -> 2 steps  {c2f_total*1e3:.1f} ms")
print(f"codec rt b1 {results['codec_roundtrip_b1']*1e3:.1f} ms  "
      f"(enc {results['encode_b1']*1e3:.1f} / dec-b{BATCH} {results[f'decode_b{BATCH}']*1e3:.1f})")
resid = e2e12 - coarse_total - c2f_total - results["encode_b1"] - results[f"decode_b{BATCH}"]
print(f"e2e total   {e2e12*1e3:.1f} ms; residual (mask/glue/reshapes) {resid*1e3:.1f} ms")
