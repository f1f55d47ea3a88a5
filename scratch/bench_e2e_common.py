"""Shared setup for the e2e scratch benches: bench.py's exact model/signal."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM


def build_iface():
    codec_cfg = CodecConfig()
    coarse_cfg, c2f_cfg = LMConfig.coarse(), LMConfig.c2f()
    codec = LAC(codec_cfg)
    audio0 = jnp.zeros((1, codec_cfg.hop_length * 4, 1), jnp.float32)
    codec_params = jax.jit(lambda k: codec.init(k, audio0))(jax.random.PRNGKey(0))[
        "params"
    ]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 16), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim), jnp.float32)
        return jax.jit(lambda k: model.init(k, codes, cbs, method="forward_codes"))(
            jax.random.PRNGKey(seed)
        )["params"]

    return codec_cfg, Interface.from_modules(
        codec_cfg=codec_cfg, codec_params=codec_params,
        coarse_cfg=coarse_cfg, coarse_params=init_lm(coarse_cfg, 1),
        c2f_cfg=c2f_cfg, c2f_params=init_lm(c2f_cfg, 2),
    )


def make_sig(codec_cfg, seconds=10.0):
    sr = codec_cfg.sample_rate
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 110 * t)
        + 0.2 * np.sin(2 * np.pi * 220 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.05 * np.random.default_rng(0).standard_normal(len(t))
    ).astype(np.float32)
    return AudioSignal(wav[None, None, :], sr)
