"""Decompose the full-scale train step: where do the 210 ms go?

Differential method (see bench_train.py): N_hi vs N_lo dependent iterations
inside ONE jitted program. Variants toggle one component each:

  SURG=full        the real step (baseline)
  SURG=lm1         1-layer LM — (full - lm1)/19 = per-layer fwd+bwd marginal
  SURG=noattn      attention replaced by identity(v) — isolates the
                   attention fwd+bwd share of the per-layer cost
  SURG=bq448       flash attention with block_q=448 (one 896-row seq = 2
                   blocks; bigger MXU tiles in the bwd kernels)
  SURG=bq896       block_q=896 — whole padded sequence per program
  SURG=nometrics   loss only — no argmax/top_k(25) accuracy metrics
  SURG=nodrop      deterministic forward (no dropout masks)
  SURG=noopt       grads only, no AdamW update (params pass through)
  SURG=nocodec     pre-encoded codes (codec encode outside the loop)
  SURG=noloss      loss = mean(logits) — ablates CE+metrics fwd+bwd
  SURG=nohead      logits = slice of the trunk output — ablates the
                   classifier matmul fwd+bwd (keeps CE shape/cost)

Run: BENCH_RBG=1 SURG=... python scratch/bench_train_surgery.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np
import optax

from vampnet_tpu import mask as pmask
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.train.step import (
    TrainState, loss_and_metrics, make_optimizer,
)
from vampnet_tpu.util import codebook_flatten

ITERS_LO, ITERS_HI = 3, 23
B = 8
SECONDS = 10.0
SURG = os.environ.get("SURG", "full")


def main():
    print("backend:", jax.default_backend(), "| variant:", SURG)
    if SURG == "noattn":
        # same params, same shapes, no attention math: out = v
        from vampnet_tpu.modules import transformer as _t

        _t.dot_product_attention = lambda q, k, v, **kw: v
    if SURG.startswith("bq"):
        from vampnet_tpu.ops import flash_attention as _fa

        _orig = _fa.flash_attention_with_bias
        _fa.flash_attention_with_bias = functools.partial(
            _orig, block_q=int(SURG[2:])
        )
    codec_cfg = CodecConfig()
    cfg = LMConfig.coarse(n_layers=1 if SURG == "lm1" else 20)
    codec = LAC(codec_cfg)
    model = VampNetLM(cfg)
    n_cb, ncc, mask_token = cfg.n_codebooks, 0, cfg.mask_token

    n_samples = int(SECONDS * codec_cfg.sample_rate)
    n_samples = (n_samples // codec_cfg.hop_length) * codec_cfg.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, n_samples, 1)) * 0.1
    codec_params = jax.jit(
        lambda k: codec.init(k, audio[:1, : codec_cfg.hop_length * 4])
    )(jax.random.PRNGKey(1))["params"]
    cbs = jax.random.normal(
        jax.random.PRNGKey(2), (n_cb, cfg.vocab_size, cfg.latent_dim)
    )
    codes0 = jnp.zeros((1, n_cb, 16), jnp.int32)
    params = jax.jit(lambda k: model.init(k, codes0, cbs, method="forward_codes"))(
        jax.random.PRNGKey(3)
    )["params"]
    opt = make_optimizer(cfg.embedding_dim)
    state = TrainState(params, jax.jit(opt.init)(params), jnp.zeros((), jnp.int32))

    pre_codes = None
    if SURG == "nocodec":
        pre_codes = jax.jit(
            lambda a: codec.apply({"params": codec_params}, a, method="encode")["codes"]
        )(audio)

    def step(state, codec_params, cbs, audio, key):
        k_r, k_mask, k_drop = jax.random.split(key, 3)
        if SURG == "nocodec":
            codes = pre_codes
        else:
            codes = codec.apply(
                {"params": codec_params}, audio, method="encode"
            )["codes"]
        z = jax.lax.stop_gradient(codes[:, :n_cb, :])
        r = jax.random.uniform(k_r, (B,))
        mask = pmask.random(k_mask, z, r)
        z_masked, mask = pmask.apply_mask(z, mask, mask_token)
        flat_mask = codebook_flatten(mask)

        def loss_fn(p):
            if SURG == "nohead":
                # trunk only; logits faked from a slice so CE cost is kept
                # while the classifier matmul (fwd+bwd) is ablated
                def trunk_fn(m, zm, cbs_):
                    x = m.embedding(m.from_codes(zm, cbs_))
                    return m.transformer(x, deterministic=False)

                out = model.apply(
                    {"params": p}, z_masked, cbs, method=trunk_fn,
                    rngs={"dropout": k_drop},
                )
                v = model.config.vocab_size
                logits = jnp.broadcast_to(
                    out[..., None, :v], out.shape[:2] + (n_cb, v)
                ).astype(jnp.float32)
                return loss_and_metrics(logits, z, flat_mask, r)
            logits = model.apply(
                {"params": p}, z_masked, cbs,
                deterministic=(SURG == "nodrop"),
                rngs=None if SURG == "nodrop" else {"dropout": k_drop},
                method="forward_codes",
            )
            if SURG == "noloss":
                loss = logits.mean()
                return loss, {"loss": loss}
            if SURG == "nometrics":
                # same gather-form CE as loss_and_metrics, minus the metrics
                b, t, c, v = logits.shape
                lf = logits.reshape(b, t * c, v)
                tgt = codebook_flatten(z)
                lse = jax.scipy.special.logsumexp(lf, axis=-1)
                tl = jnp.take_along_axis(lf, tgt[..., None], axis=-1)[..., 0]
                ce = lse - 0.9 * tl - 0.1 * lf.mean(-1)
                w = flat_mask.astype(jnp.float32)
                loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
                return loss, {"loss": loss}
            return loss_and_metrics(logits, z, flat_mask, r)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if SURG == "noopt":
            metrics["grad_norm"] = optax.global_norm(grads)
            # params must still depend on grads or the bwd pass is DCE'd
            params = jax.tree_util.tree_map(
                lambda p, g: p + 0.0 * g, state.params, grads
            )
            return TrainState(params, state.opt_state, state.step + 1), metrics
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(0,))
    def loop(state, codec_params, cbs, audio, key, iters):
        def body(i, carry):
            state, key = carry
            key, k = jax.random.split(key)
            # roll the waveform per iteration so the codec encode is NOT
            # loop-invariant (XLA LICM would hoist it out of the measured
            # loop otherwise; see bench_train.py)
            state, _ = step(
                state, codec_params, cbs, jnp.roll(audio, i, axis=1), k
            )
            return state, key

        state, _ = jax.lax.fori_loop(0, iters, body, (state, key))
        return state, optax.global_norm(state.params)

    impl = "rbg" if os.environ.get("BENCH_RBG") else "threefry2x32"
    key0 = jax.random.key(9, impl=impl)
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
    print(f"[{SURG}] step: {ms:.1f} ms")


if __name__ == "__main__":
    main()
