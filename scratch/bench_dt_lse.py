"""Round-4 probe: why did the (d,t) TRAINING forward (fwd+lse) regress?

The inference dt kernel (no lse) won 1.6-2x at the same shapes, but wiring
the dt fwd+lse variant into the VJP made the b=8 train step 164 -> 341 ms.
Suspects: (a) the lse row write is a sublane->lane transpose per program,
(b) the padded-out residual save defeats the pad elision, (c) fusion-context
VMEM pressure. This probe times the three kernels standalone (chained
differential) at train shape to separate kernel cost from program context.

Run: python scratch/bench_dt_lse.py  (real TPU)
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

from vampnet_tpu.ops import flash_attention as fa

B = int(os.environ.get("PB", "8"))
T = int(os.environ.get("PT", "864"))
H, D = 20, 64
DTYPE = jnp.bfloat16
ITERS_LO, ITERS_HI = 2, 12

TP = fa._round_up(T, 128)
DP = fa._round_up(D, 128)
BH = B * H


def _wall(fn, iters, n=3):
    np.asarray(fn(jnp.int32(iters)))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(jnp.int32(iters)))
        best = min(best, time.perf_counter() - t0)
    return best


def _diff_ms(fn):
    lo, hi = _wall(fn, ITERS_LO), _wall(fn, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def main():
    print(f"backend: {jax.default_backend()}  B={B} T={T} (TP={TP}) H={H} D={D}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    qp = (jax.random.normal(ks[0], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    kp = (jax.random.normal(ks[1], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    vp = (jax.random.normal(ks[2], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    bias_p = jax.random.normal(ks[3], (H, TP, TP), jnp.float32) * 0.1

    def chain(body):
        @jax.jit
        def run(iters):
            def step(i, q):
                return body(q)

            out = jax.lax.fori_loop(0, iters, step, qp)
            return jnp.sum(out.astype(jnp.float32))

        return run

    # 1. production (t,d) fwd+lse
    def td_lse(q):
        out, lse = fa._fwd_call(q, kp, vp, bias_p, TP, H, False, with_lse=True)
        mix = lse[:, :, :DP].astype(out.dtype) * 1e-6
        return out + mix

    # 2. new (d,t) fwd+lse
    def dt_lse(q):
        out, lse = fa._fwd_call_dt(q, kp, vp, bias_p, H, D, False, with_lse=True)
        mix = lse[:, :, :DP].astype(out.dtype) * 1e-6
        return out + mix

    # 3. inference (d,t) fwd (no lse)
    def dt_only(q):
        return fa._fwd_call_dt(q, kp, vp, bias_p, H, D, False, with_lse=False)

    for name, body in (("td_lse", td_lse), ("dt_lse", dt_lse), ("dt_only", dt_only)):
        ms = _diff_ms(chain(body))
        print(f"{name:8s}: {ms:8.3f} ms / call  ({ms / (H * B):.4f} ms per (b,h))",
              flush=True)


if __name__ == "__main__":
    main()
