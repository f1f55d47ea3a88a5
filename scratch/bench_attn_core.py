"""Standalone attention-core timing at train shapes (b=8, h=20, t=864, d=64).

Differential method: N_hi vs N_lo dependent iterations inside one jitted
program (chained via adding the output back into q) — isolates the
flash_attention_with_bias fwd and fwd+bwd device cost from tunnel RPC.

Run: python scratch/bench_attn_core.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

from vampnet_tpu.ops.flash_attention import flash_attention_with_bias

B, H, T, D = 8, 20, 864, 64
# wide window: the 10-iteration diff (~10 ms fwd) drowned in tunnel RPC
# noise (±10s of ms); ~100 dependent iterations give a stable per-call read
ITERS_LO, ITERS_HI = 2, int(os.environ.get("ITERS_HI", 102))


def main():
    print("backend:", jax.default_backend())
    kq, kk, kv, kb = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, H, D), jnp.bfloat16)
    bias = jax.random.normal(kb, (H, T, T), jnp.float32) * 0.5

    @functools.partial(jax.jit, static_argnames=("iters", "with_bwd"))
    def loop(q, k, v, bias, iters, with_bwd):
        def fwd_body(i, qc):
            o = flash_attention_with_bias(qc, k, v, bias)
            return qc + 0.001 * o

        def bwd_body(i, carry):
            qc, kc, vc, bc = carry

            def loss(qq, kk_, vv, bb):
                return jnp.sum(
                    flash_attention_with_bias(qq, kk_, vv, bb).astype(jnp.float32) ** 2
                )

            dq, dk, dv, db = jax.grad(loss, (0, 1, 2, 3))(qc, kc, vc, bc)
            return (
                qc + 0.0001 * dq, kc + 0.0001 * dk,
                vc + 0.0001 * dv, bc + 0.0001 * db,
            )

        if with_bwd:
            out = jax.lax.fori_loop(0, iters, bwd_body, (q, k, v, bias))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in out)
        out = jax.lax.fori_loop(0, iters, fwd_body, q)
        return jnp.sum(out.astype(jnp.float32))

    def wall(iters, with_bwd, n=5):
        np.asarray(loop(q, k, v, bias, iters, with_bwd))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(loop(q, k, v, bias, iters, with_bwd))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, with_bwd in (("fwd", False), ("fwd+bwd", True)):
        lo, hi = wall(ITERS_LO, with_bwd), wall(ITERS_HI, with_bwd)
        ms = (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3
        # padded matmul flops actually executed (dp=128): fwd 2 score
        # matmuls, bwd adds 5
        nmm = 2 if not with_bwd else 7
        tp, dp = 896, 128
        tf = nmm * 2 * tp * tp * dp * B * H / 1e12
        print(f"[{name}] {ms:.2f} ms/call | padded {tf:.2f} TF -> "
              f"{tf / (ms / 1e3):.0f} TF/s", flush=True)


if __name__ == "__main__":
    main()
