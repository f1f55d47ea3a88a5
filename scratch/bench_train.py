"""Full-scale training-step timing on the real TPU.

Measures the complete jitted train step (frozen-codec encode -> random mask
-> LM fwd/bwd with dropout -> AdamW+Noam) at coarse-model scale, with the
state chained through a fori_loop so the differential method cancels the
tunnel RPC (see bench_int8.py).

Run: python scratch/bench_train.py
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
import optax

from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.train.step import TrainState, make_optimizer, make_train_step

ITERS_LO, ITERS_HI = 3, 23
B = int(os.environ.get("BENCH_B", 8))
SECONDS = 10.0


def main():
    print("backend:", jax.default_backend())
    codec_cfg = CodecConfig()
    cfg = LMConfig.coarse(
        remat=bool(os.environ.get("BENCH_REMAT")),
        attention_impl=os.environ.get("BENCH_ATTN", "auto"),
    )
    codec = LAC(codec_cfg)
    model = VampNetLM(cfg)

    n_samples = int(SECONDS * codec_cfg.sample_rate)
    n_samples = (n_samples // codec_cfg.hop_length) * codec_cfg.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, n_samples, 1)) * 0.1
    codec_params = jax.jit(lambda k: codec.init(k, audio[:1, : codec_cfg.hop_length * 4]))(
        jax.random.PRNGKey(1)
    )["params"]
    cbs = jax.random.normal(
        jax.random.PRNGKey(2), (cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim)
    )
    codes0 = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
    params = jax.jit(lambda k: model.init(k, codes0, cbs, method="forward_codes"))(
        jax.random.PRNGKey(3)
    )["params"]
    opt = make_optimizer(
        cfg.embedding_dim, state_dtype=os.environ.get("BENCH_ADAM_DTYPE") or None
    )
    state = TrainState(params, jax.jit(opt.init)(params), jnp.zeros((), jnp.int32))
    enc_mb = int(os.environ.get("BENCH_ENC_MB", 0)) or None
    step = make_train_step(model, codec, opt, encode_microbatch=enc_mb)

    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def loop(state, codec_params, cbs, audio, key, iters):
        def body(i, carry):
            state, key = carry
            key, k = jax.random.split(key)
            # a fresh batch every iteration: roll the waveform by i samples.
            # With loop-INVARIANT audio, XLA's loop-invariant code motion
            # hoists the whole codec encode out of the fori_loop and the
            # differential silently excludes it (how the "encode ~0.7 ms"
            # myth happened); the roll itself is one cheap device copy.
            state, _ = step(
                state, codec_params, cbs, jnp.roll(audio, i, axis=1), k
            )
            return state, key

        state, _ = jax.lax.fori_loop(0, iters, body, (state, key))
        # observe EVERY param leaf or XLA dead-code-eliminates the step
        return state, optax.global_norm(state.params)

    # BENCH_RBG=1: hardware-RNG keys for the in-step randomness (dropout
    # masks dominate: ~700M threefry words/step on the VPU)
    impl = "rbg" if os.environ.get("BENCH_RBG") else "threefry2x32"
    key0 = jax.random.key(9, impl=impl)
    print("prng impl:", impl)

    # the state is DONATED (as in the real train loop) — thread it through
    holder = {"state": state}

    def run(iters):
        st, norm = loop(holder["state"], codec_params, cbs, audio, key0, iters)
        holder["state"] = st
        np.asarray(norm)

    def wall(iters, n=3):
        run(iters)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            run(iters)
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = wall(ITERS_LO), wall(ITERS_HI)
    ms = (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3
    t_tokens = n_samples // codec_cfg.hop_length
    tok = B * t_tokens
    # fwd+bwd ~ 3x forward matmul FLOPs of the LM (params ~330M active/token)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tflop = 2 * n_params * tok * 3 / 1e12
    print(f"train step (b={B}, {SECONDS:.0f}s audio, {tok} tokens): {ms:.1f} ms")
    print(f"  {tok / (ms / 1e3):,.0f} tokens/s | ~{tflop / (ms / 1e3):.1f} TF/s "
          f"({n_params/1e6:.0f}M params)")


if __name__ == "__main__":
    main()
