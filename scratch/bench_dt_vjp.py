"""Round-4 probe #2: the dt fwd+lse kernel is FASTER standalone (0.613 vs
0.664 ms at b=8 train shape), yet the full train step regressed 164 -> 341 ms
with it wired into the VJP. Reproduce the exact VJP computation graph
(fwd -> delta -> whole-seq backward) for both forward layouts, chained, to
find where the program context loses 2x.

Run: python scratch/bench_dt_vjp.py  (real TPU)
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
ITERS_LO, ITERS_HI = 2, 10

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
    ks = jax.random.split(key, 5)
    qp = (jax.random.normal(ks[0], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    kp = (jax.random.normal(ks[1], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    vp = (jax.random.normal(ks[2], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    do = (jax.random.normal(ks[3], (BH, TP, DP), jnp.float32) * 0.3).astype(DTYPE)
    bias_p = jax.random.normal(ks[4], (H, TP, TP), jnp.float32) * 0.1

    def vjp_graph(fwd_dt):
        def body(q):
            if fwd_dt:
                out, lse = fa._fwd_call_dt(q, kp, vp, bias_p, H, D, False,
                                           with_lse=True)
            else:
                out, lse = fa._fwd_call(q, kp, vp, bias_p, TP, H, False,
                                        with_lse=True)
            delta = jnp.sum(
                do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
            )[:, None, :]
            dq, dk, dv, dbias = fa._bwd_wholeseq_call(
                q, kp, vp, bias_p, lse, do, delta, H, False
            )
            mix = (dk + dv).astype(dq.dtype) * 1e-6
            return (dq + mix).astype(DTYPE)

        @jax.jit
        def run(iters):
            out = jax.lax.fori_loop(0, iters, lambda i, q: body(q), qp)
            return jnp.sum(out.astype(jnp.float32))

        return run

    # also time jax.grad through the public entry (the REAL train path),
    # toggled between the two forwards via the dispatch condition
    q4 = (jax.random.normal(ks[0], (B, T, H, D), jnp.float32) * 0.3).astype(DTYPE)
    k4 = (jax.random.normal(ks[1], (B, T, H, D), jnp.float32) * 0.3).astype(DTYPE)
    v4 = (jax.random.normal(ks[2], (B, T, H, D), jnp.float32) * 0.3).astype(DTYPE)
    bias4 = jax.random.normal(ks[4], (H, T, T), jnp.float32) * 0.1

    def public_grad():
        g = jax.grad(
            lambda q: jnp.sum(
                fa.flash_attention_with_bias(q, k4, v4, bias=bias4).astype(
                    jnp.float32
                )
            )
        )

        @jax.jit
        def run(iters):
            out = jax.lax.fori_loop(0, iters, lambda i, q: g(q).astype(DTYPE), q4)
            return jnp.sum(out.astype(jnp.float32))

        return run

    for name, fn in (
        ("vjp_td", vjp_graph(False)),
        ("vjp_dt", vjp_graph(True)),
        ("public_grad(dt)", public_grad()),
    ):
        ms = _diff_ms(fn)
        print(f"{name:16s}: {ms:8.3f} ms / call", flush=True)


if __name__ == "__main__":
    main()
