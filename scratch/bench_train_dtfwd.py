"""Round-4 probe #3: decide the dt training forward with a SINGLE-PROCESS
back-to-back train-step measurement (dt fwd+lse vs td fwd+lse), immune to
tunnel weather drifting between runs.

The 341 ms reading that flagged a "2x regression" was taken through a
degraded tunnel; the per-layer VJP probe (bench_dt_vjp.py) later measured
vjp_dt 1.842 ms vs vjp_td 1.923 ms.  This probe answers it at full-step
scale: the td variant is produced by shimming fa._fwd_call_dt onto
fa._fwd_call (identical output avals), so both steps share everything else.

Run: python scratch/bench_train_dtfwd.py   (real TPU)
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
from vampnet_tpu.ops import flash_attention as fa
from vampnet_tpu.train.step import TrainState, make_optimizer, make_train_step

ITERS_LO, ITERS_HI = 3, 23
B = int(os.environ.get("BENCH_B", 8))
SECONDS = 10.0

_REAL_FWD_DT = fa._fwd_call_dt


def _td_shim(qp, kp, vp, bias_p, h, d, interpret, with_lse=False):
    """Route the dt dispatch back onto the (t,d) kernel (identical avals)."""
    tp = qp.shape[1]
    return fa._fwd_call(qp, kp, vp, bias_p, tp, h, interpret, with_lse=with_lse)


def build(codec, model, codec_cfg, cfg):
    n_samples = int(SECONDS * codec_cfg.sample_rate)
    n_samples = (n_samples // codec_cfg.hop_length) * codec_cfg.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, n_samples, 1)) * 0.1
    codec_params = jax.jit(
        lambda k: codec.init(k, audio[:1, : codec_cfg.hop_length * 4])
    )(jax.random.PRNGKey(1))["params"]
    cbs = jax.random.normal(
        jax.random.PRNGKey(2), (cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim)
    )
    codes0 = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
    params = jax.jit(lambda k: model.init(k, codes0, cbs, method="forward_codes"))(
        jax.random.PRNGKey(3)
    )["params"]
    opt = make_optimizer(cfg.embedding_dim)
    state = TrainState(params, jax.jit(opt.init)(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, codec, opt)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return audio, codec_params, cbs, state, step, n_samples, n_params


def measure(step, state, codec_params, cbs, audio, n_samples, n_params, tag):
    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def loop(state, codec_params, cbs, audio, key, iters):
        def body(i, carry):
            state, key = carry
            key, k = jax.random.split(key)
            state, _ = step(
                state, codec_params, cbs, jnp.roll(audio, i, axis=1), k
            )
            return state, key

        state, _ = jax.lax.fori_loop(0, iters, body, (state, key))
        return state, optax.global_norm(state.params)

    key0 = jax.random.key(9, impl="rbg")
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
    tok = B * (n_samples // 512)
    tflop = 2 * n_params * tok * 3 / 1e12
    print(
        f"[{tag}] train step b={B}: {ms:.1f} ms | {tok / (ms / 1e3):,.0f} tok/s"
        f" | ~{tflop / (ms / 1e3):.1f} TF/s",
        flush=True,
    )
    return ms


def main():
    print("backend:", jax.default_backend(), " B =", B)
    codec_cfg = CodecConfig()
    cfg = LMConfig.coarse()
    codec = LAC(codec_cfg)
    model = VampNetLM(cfg)
    audio, codec_params, cbs, state0, step, n_samples, n_params = build(
        codec, model, codec_cfg, cfg
    )

    order = os.environ.get("BENCH_ORDER", "dt,td,dt").split(",")
    results = {}
    for tag in order:
        fa._fwd_call_dt = _REAL_FWD_DT if tag == "dt" else _td_shim
        try:
            # fresh state per variant (donated); rebuild is host-side cheap
            state = jax.tree_util.tree_map(jnp.copy, state0)
            results.setdefault(tag, []).append(
                measure(step, state, codec_params, cbs, audio, n_samples,
                        n_params, tag)
            )
        finally:
            fa._fwd_call_dt = _REAL_FWD_DT
    for tag, vals in results.items():
        print(f"{tag}: {[round(v, 1) for v in vals]}")


if __name__ == "__main__":
    main()
