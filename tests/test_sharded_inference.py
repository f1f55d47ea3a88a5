"""Multi-chip inference: Interface.shard over a virtual mesh must reproduce
single-device results (GSPMD propagates tp/dp layouts through generate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.parallel import make_mesh

CODEC_CFG = CodecConfig(
    sample_rate=8000, encoder_dim=8, encoder_rates=(2, 4, 4),
    decoder_dim=64, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=32, codebook_dim=4,
)
COARSE_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=2, latent_dim=4,
    embedding_dim=64, vocab_size=32, dropout=0.0,
)


def _iface():
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]
    model = VampNetLM(COARSE_CFG)
    codes = jnp.zeros((1, 2, 8), jnp.int32)
    cbs = jnp.zeros((2, 32, 4))
    params = model.init(jax.random.PRNGKey(1), codes, cbs, method="forward_codes")["params"]
    return Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=COARSE_CFG, coarse_params=params,
        coarse_chunk_size_s=0.2,
    )


def _sig():
    t = np.arange(2400) / 8000
    return AudioSignal((0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, None, :], 8000)


def test_sharded_vamp_matches_single_device():
    iface = _iface()
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    ref = np.asarray(iface.coarse_vamp(z, mask, seed=3, _sampling_steps=3))

    iface.shard(tp=2)  # 4 dp x 2 tp over the 8 virtual devices
    params_sharding = jax.tree_util.tree_leaves(iface.coarse.params)[0].sharding
    assert hasattr(params_sharding, "mesh")
    out = np.asarray(iface.coarse_vamp(z, mask, seed=3, _sampling_steps=3))
    # same seed + same math (up to reduction order): token streams should
    # be overwhelmingly identical
    agree = (out == ref).mean()
    assert agree > 0.98, f"only {agree:.3f} of tokens agree after sharding"


def test_sharded_params_actually_distributed():
    iface = _iface()
    iface.shard(tp=2)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(iface.coarse.params)
    w1 = flat[("transformer", "layers_0", "feed_forward", "w_1", "kernel")]
    # sharded over tp on the output dim
    assert len(w1.sharding.device_set) >= 2


def test_engine_data_parallel_serving():
    from vampnet_tpu.serve import VampEngine, VampRequest

    iface = _iface()
    iface.shard(tp=1)  # 8-way dp over the virtual devices
    eng = VampEngine(iface, max_wait_ms=200.0, max_batch=8, data_parallel=True)
    z = np.asarray(iface.encode(_sig()))
    mask = np.asarray(iface.build_mask(jnp.asarray(z), seed=0))
    futs = [
        eng.submit(VampRequest(codes=z, mask=mask, seed=i, sampling_steps=2,
                               coarse_only=True))
        for i in range(3)  # 3 requests pad to dp=8 rows on device
    ]
    outs = [f.result(240) for f in futs]
    for o in outs:
        assert o.shape == z.shape
        assert (o != iface.coarse.mask_token).all()
    assert eng.stats["requests"] == 3
    eng.close()
