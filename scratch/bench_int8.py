"""Microbench: fused w8a8 Pallas kernel vs bf16 XLA matmul at LM shapes.

Each measurement runs ITERS dependent matmuls inside ONE jitted program —
per-dispatch timing through the axon tunnel measures RPC latency, not
compute (CLAUDE.md).

Run on the real TPU:  python scratch/bench_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import functools

import jax.numpy as jnp
import numpy as np

from vampnet_tpu.modules.quantize import quantize_kernel
from vampnet_tpu.ops.int8_matmul import w8a8_matmul

ITERS_LO, ITERS_HI = 50, 1050  # differential timing cancels tunnel RPC

# coarse LM: b*t = 2*864 = 1728 rows (single-stream); BENCH_M overrides
# (serving batch-8: m = 8*864 = 6912)
_M = int(os.environ.get("BENCH_M", 1728))
SHAPES = [
    ("qkv/fc 1280->1280", _M, 1280, 1280),
    ("w_1 1280->5120", _M, 1280, 5120),
    ("w_2 2560->1280", _M, 2560, 1280),
]


def chain(x, out):
    # data dependency between iterations without changing values meaningfully
    return x + (jnp.sum(out).astype(x.dtype) * jnp.asarray(1e-30, x.dtype))


@functools.partial(jax.jit, static_argnames=("impl", "iters"))
def loop_w8a8(x, wq, ws, impl, iters):
    def body(_, x):
        out = w8a8_matmul(x, wq, ws, out_dtype=jnp.bfloat16, impl=impl)
        return chain(x, out)

    return jax.lax.fori_loop(0, iters, body, x)


@functools.partial(jax.jit, static_argnames=("iters",))
def loop_bf16(x, w, iters):
    def body(_, x):
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return chain(x, out)

    return jax.lax.fori_loop(0, iters, body, x)


def _wall(fn, *args, n=3):
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args):
    lo = _wall(fn, *args, ITERS_LO)
    hi = _wall(fn, *args, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def main():
    print("backend:", jax.default_backend())
    for name, m, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
        wq, ws = quantize_kernel(w)
        w_bf16 = jnp.asarray(w, jnp.bfloat16)

        t_bf16 = timeit(loop_bf16, x, w_bf16)
        t_i8 = timeit(loop_w8a8, x, wq, ws, "pallas")
        t_i8_xla = timeit(loop_w8a8, x, wq, ws, "xla")
        flops = 2 * m * k * n
        print(
            f"{name}: bf16 {t_bf16:.4f} ms ({flops/(t_bf16*1e-3)/1e12:.1f} TF/s) | "
            f"w8a8 pallas {t_i8:.4f} ms ({flops/(t_i8*1e-3)/1e12:.1f} TOP/s) | "
            f"w8a8 xla {t_i8_xla:.4f} ms"
        )


if __name__ == "__main__":
    main()
