"""Decompose the coarse forward: per-layer marginal cost + fixed overhead.

Differential timing (see bench_int8.py): ITERS_HI vs ITERS_LO dependent
forwards inside one jitted program cancels the tunnel RPC.

Run on the real TPU:  python scratch/bench_forward.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from vampnet_tpu.modules import LMConfig, VampNetLM

ITERS_LO, ITERS_HI = 10, 110
B, T = 2, 864


def build(cfg, b=B, t=T):
    model = VampNetLM(cfg)
    codes = jnp.zeros((b, cfg.n_codebooks, t), jnp.int32)
    cbs = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim)
    )
    params = jax.jit(lambda k: model.init(k, codes, cbs, method="forward_codes"))(
        jax.random.PRNGKey(0)
    )["params"]
    hoist_bias = not os.environ.get("BENCH_BIAS_INSIDE")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(params, codes, cbs, iters):
        # production shape: the sampler hoists the T5 bias out of its loop
        # (generate.py); without this the "fixed" cost is ~2.2 ms of bias
        # build inside layer 0, not embed/classifier
        bias = None
        if hoist_bias:
            from vampnet_tpu.modules.transformer import position_bias_from_params

            bias = position_bias_from_params(params, cfg, t)

        def body(_, codes):
            logits = model.apply(
                {"params": params}, codes, cbs, method="forward_codes",
                position_bias=bias,
            )
            bump = (jnp.sum(logits) * 1e-30).astype(jnp.int32)  # 0 at runtime
            return codes + bump

        return jax.lax.fori_loop(0, iters, body, codes)

    return loop, params, codes, cbs


def _wall(fn, *args, n=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(loop, params, codes, cbs):
    lo = _wall(loop, params, codes, cbs, ITERS_LO)
    hi = _wall(loop, params, codes, cbs, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


def main():
    print("backend:", jax.default_backend())
    base = LMConfig.coarse()
    results = {}
    c2f = LMConfig.c2f()
    variants = [
        ("20L bf16", base, B, T),
        ("1L bf16", dataclasses.replace(base, n_layers=1), B, T),
        ("20L int8", dataclasses.replace(base, quantization="int8"), B, T),
        ("20L xla-attn", dataclasses.replace(base, attention_impl="xla"), B, T),
        # the opt-in fused GEGLU FFN kernel (auto resolves to xla since the
        # net-negative measurement — this variant re-validates it)
        ("20L fused-ffn", dataclasses.replace(base, ffn_impl="fused"), B, T),
        # c2f at its vamp_e2e serving shape: 2x10s -> 8 rows of 3 s chunks
        ("c2f 16L bf16", c2f, 8, 260),
        ("c2f 1L bf16", dataclasses.replace(c2f, n_layers=1), 8, 260),
        # engine batch-8 shapes (8 concurrent 10 s requests)
        ("20L bf16 b8", base, 8, 864),
        ("c2f 16L b32", c2f, 32, 260),
        # int8 at serving shapes: m is large enough that w8a8 (XLA path)
        # should beat bf16 — see bench_int8.py at BENCH_M=6912
        ("20L int8 b8", dataclasses.replace(base, quantization="int8"), 8, 864),
        ("c2f int8 b32", dataclasses.replace(c2f, quantization="int8"), 32, 260),
    ]
    only = os.environ.get("BENCH_ONLY")
    if only:
        variants = [vc for vc in variants if vc[0] in only.split(",")]
    for tag, cfg, b, t in variants:
        loop, params, codes, cbs = build(cfg, b, t)
        if cfg.quantization == "int8":
            from vampnet_tpu.modules.quantize import quantize_lm_params

            params = quantize_lm_params(params)
        t = timeit(loop, params, codes, cbs)
        results[tag] = t
        print(f"{tag}: {t:.3f} ms / forward")
    if "20L bf16" in results and "1L bf16" in results:
        per_layer = (results["20L bf16"] - results["1L bf16"]) / 19
        fixed = results["1L bf16"] - per_layer
        print(f"per-layer {per_layer:.3f} ms | fixed (embed+classifier+reshape) {fixed:.3f} ms")
    if "c2f 16L bf16" in results and "c2f 1L bf16" in results:
        per_layer = (results["c2f 16L bf16"] - results["c2f 1L bf16"]) / 15
        fixed = results["c2f 1L bf16"] - per_layer
        print(f"c2f per-layer {per_layer:.3f} ms | c2f fixed {fixed:.3f} ms")


def surgery():
    """Locate the fixed ~2.2 ms: time sub-graphs of the forward."""
    import functools

    base = LMConfig.coarse()
    model = VampNetLM(base)
    codes = jnp.zeros((B, base.n_codebooks, T), jnp.int32)
    cbs = jax.random.normal(
        jax.random.PRNGKey(1), (base.n_codebooks, base.vocab_size, base.latent_dim)
    )
    params = jax.jit(lambda k: model.init(k, codes, cbs, method="forward_codes"))(
        jax.random.PRNGKey(0)
    )["params"]

    def lp(method, mk_bump):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(params, codes, cbs, iters):
            def body(_, codes):
                out = model.apply({"params": params}, codes, cbs, method=method)
                return codes + mk_bump(out)

            return jax.lax.fori_loop(0, iters, body, codes)

        return loop

    bump_f = lambda out: (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(jnp.int32)

    variants = {
        "embed only": lambda m, c, cb: m.embedding(m.from_codes(c, cb)),
        "embed+stack (no classifier)": lambda m, c, cb: m.transformer(
            m.embedding(m.from_codes(c, cb))
        ),
        "full": lambda m, c, cb: m.forward_codes(c, cb),
    }
    for tag, method in variants.items():
        loop = lp(method, bump_f)
        t = timeit(loop, params, codes, cbs)
        print(f"{tag}: {t:.3f} ms")


if __name__ == "__main__":
    if os.environ.get("BENCH_SURGERY"):
        surgery()
    else:
        main()
