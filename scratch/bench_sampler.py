"""Fused sampler kernel on real TPU: correctness of the noise path +
differential-timing comparison vs the XLA sampler at coarse shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import functools

import jax.numpy as jnp
import numpy as np

from vampnet_tpu.ops.sampler_kernel import fused_sample_from_logits
from vampnet_tpu.sampling.sample import sample_from_logits

ITERS_LO, ITERS_HI = 20, 220
B, FLAT, V = 2, 3456, 1024


def correctness():
    b, flat, v = 2, 256, 128
    logits = jax.random.normal(jax.random.PRNGKey(0), (b, flat, v)) * 2.0
    keys = jax.random.split(jax.random.PRNGKey(7), b).astype(jnp.uint32)
    kw = dict(typical_filtering=True, typical_mass=0.3, typical_min_tokens=8,
              block_f=128)

    t1, p1 = fused_sample_from_logits(keys, 3, logits, 1.0, 1.0, **kw)
    t2, _ = fused_sample_from_logits(keys, 3, logits, 1.0, 1.0, **kw)
    print("deterministic:", np.array_equal(np.asarray(t1), np.asarray(t2)))
    t_other, _ = fused_sample_from_logits(keys, 4, logits, 1.0, 1.0, **kw)
    print("step changes draw:", not np.array_equal(np.asarray(t1), np.asarray(t_other)))
    ts, _ = fused_sample_from_logits(keys[:1], 3, logits[:1], 1.0, 1.0, **kw)
    print("solo==batched:", np.array_equal(np.asarray(ts[0]), np.asarray(t1[0])))

    # statistics: sampled-token distribution ~ filtered softmax
    pk = jnp.zeros((1, 1, 8), jnp.float32).at[0, 0].set(
        jnp.asarray([3.0, 2.0, 1.0, 0.0, -1.0, -20.0, -20.0, -20.0])
    )
    big = jnp.broadcast_to(pk, (1, 8192, 8))
    tok, _ = fused_sample_from_logits(
        jax.random.PRNGKey(11)[None].astype(jnp.uint32), 0, big, 1.0, 1.0,
        typical_filtering=False, block_f=512,
    )
    counts = np.bincount(np.asarray(tok).ravel(), minlength=8) / 8192
    probs = np.asarray(jax.nn.softmax(pk[0, 0]))
    print("empirical:", np.round(counts, 3))
    print("expected: ", np.round(probs, 3))
    err = np.abs(counts - probs).max()
    print("max freq err:", round(float(err), 4), "(ok <0.02)" if err < 0.02 else "TOO BIG")


def bench():
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, FLAT, V)) * 2.0
    keys = jax.random.split(jax.random.PRNGKey(7), B).astype(jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_fused(logits, keys, iters):
        def body(i, lg):
            tok, prob = fused_sample_from_logits(
                keys, i, lg, 0.8, 1.0,
                typical_filtering=True, typical_mass=0.15, typical_min_tokens=64,
            )
            bump = (jnp.sum(prob) * 1e-30).astype(lg.dtype)
            return lg + bump

        return jax.lax.fori_loop(0, iters, body, logits)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_xla(logits, key, iters):
        def body(i, lg):
            tok, prob = sample_from_logits(
                jax.random.fold_in(key, i), lg, sample=True, temperature=0.8,
                typical_filtering=True, typical_mass=0.15, typical_min_tokens=64,
                return_probs=True,
            )
            bump = (jnp.sum(prob) * 1e-30).astype(lg.dtype)
            return lg + bump

        return jax.lax.fori_loop(0, iters, body, logits)

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

    t_f = timeit(loop_fused, logits, keys)
    t_x = timeit(loop_xla, logits, jax.random.PRNGKey(3))
    print(f"sampling step at ({B},{FLAT},{V}): fused {t_f:.3f} ms | xla {t_x:.3f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    correctness()
    bench()
