"""Decompose one transformer layer at coarse shapes: where do 0.6 ms go?

Differential timing (see bench_int8.py). Run: python scratch/bench_layer.py
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

from vampnet_tpu.modules.transformer import (
    FeedForward,
    MultiHeadRelativeAttention,
    RMSNorm,
    TransformerLayer,
    relative_position_bucket,
)
from vampnet_tpu.ops.flash_attention import flash_attention_with_bias

ITERS_LO, ITERS_HI = 20, 220
B, T, D, H = 2, 864, 1280, 20


def _wall(fn, *args, n=3):
    np.asarray(fn(*args))
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


def chain(x, out):
    return x + (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x.dtype)


def bench_module(mod, x, extra_args=(), init_key=0, **apply_kw):
    params = mod.init(jax.random.PRNGKey(init_key), x, *extra_args, **apply_kw)["params"]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(params, x, iters):
        def body(_, x):
            out = mod.apply({"params": params}, x, *extra_args, **apply_kw)
            if isinstance(out, tuple):
                out = out[0]
            return chain(x, out)

        return jax.lax.fori_loop(0, iters, body, x)

    return timeit(loop, params, x)


def main():
    print("backend:", jax.default_backend())
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.bfloat16)

    t_layer = bench_module(
        TransformerLayer(n_heads=H, has_relative_attention_bias=True, dropout=0.0),
        x,
    )
    print(f"full layer (bias built inside): {t_layer:.3f} ms")

    # post-hoist shape: bias precomputed once, threaded through the layer
    table0 = jax.random.normal(jax.random.PRNGKey(3), (32, H), jnp.float32)
    rel0 = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    buckets0 = relative_position_bucket(rel0, bidirectional=True, num_buckets=32,
                                        max_distance=128)
    bias0 = jnp.transpose(table0[buckets0], (2, 0, 1))
    mod_nb = TransformerLayer(n_heads=H, has_relative_attention_bias=False, dropout=0.0)
    params_nb = mod_nb.init(jax.random.PRNGKey(0), x, position_bias=bias0)["params"]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_nb(params, x, bias, iters):
        def body(_, x):
            out, _ = mod_nb.apply({"params": params}, x, position_bias=bias)
            return chain(x, out)

        return jax.lax.fori_loop(0, iters, body, x)

    print(f"full layer (bias precomputed): {timeit(loop_nb, params_nb, x, bias0):.3f} ms")

    # norm -> dense chain at qkv/ffn shapes: how much does the unfused norm add?
    import flax.linen as nn

    class NormDense(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            y = RMSNorm(name="n")(x)
            return nn.Dense(self.features, dtype=jnp.bfloat16,
                            param_dtype=jnp.float32, name="d")(y)

    class BareDense(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            return nn.Dense(self.features, dtype=jnp.bfloat16,
                            param_dtype=jnp.float32, name="d")(x)

    for f in (1280, 5120):
        tn = bench_module(NormDense(features=f), x)
        tb = bench_module(BareDense(features=f), x)
        print(f"norm+dense({f}): {tn:.3f} ms   bare dense({f}): {tb:.3f} ms"
              f"   norm adds {tn - tb:.3f} ms")

    t_attn_mod = bench_module(
        MultiHeadRelativeAttention(n_head=H, has_relative_attention_bias=True),
        x, extra_args=(x, x),
    )
    print(f"attention module (qkv+kernel+fc+bias): {t_attn_mod:.3f} ms")

    t_ffn = bench_module(FeedForward(dropout=0.0), x)
    print(f"ffn (GEGLU 4x): {t_ffn:.3f} ms")

    t_norm = bench_module(RMSNorm(), x)
    print(f"rmsnorm: {t_norm:.3f} ms")

    # bare attention kernel with precomputed bias
    q = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D // H), jnp.bfloat16)
    table = jax.random.normal(jax.random.PRNGKey(3), (32, H), jnp.float32)
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    buckets = relative_position_bucket(rel, bidirectional=True, num_buckets=32,
                                       max_distance=128)
    bias = jnp.transpose(table[buckets], (2, 0, 1))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_kernel(q, bias, iters):
        def body(_, q):
            out = flash_attention_with_bias(q, q, q, bias=bias)
            return chain(q, out)

        return jax.lax.fori_loop(0, iters, body, q)

    print(f"pallas attention kernel: {timeit(loop_kernel, q, bias):.3f} ms")


if __name__ == "__main__":
    main()
