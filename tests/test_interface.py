"""End-to-end Interface tests on tiny models (encode -> mask -> vamp -> decode)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM

CODEC_CFG = CodecConfig(
    sample_rate=16000, encoder_dim=16, encoder_rates=(2, 4, 4),
    decoder_dim=128, decoder_rates=(4, 4, 2), n_codebooks=6,
    codebook_size=32, codebook_dim=4,
)
COARSE_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=2, n_conditioning_codebooks=0,
    latent_dim=4, embedding_dim=64, vocab_size=32, dropout=0.0,
)
C2F_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=6, n_conditioning_codebooks=2,
    latent_dim=4, embedding_dim=64, vocab_size=32, dropout=0.0,
)


@pytest.fixture(scope="module")
def interface():
    codec = LAC(CODEC_CFG)
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, CODEC_CFG.hop_length * 8, 1)) * 0.1
    codec_params = codec.init(jax.random.PRNGKey(1), audio)["params"]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 8), dtype=jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim))
        return model.init(jax.random.PRNGKey(seed), codes, cbs, method="forward_codes")["params"]

    iface = Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=COARSE_CFG, coarse_params=init_lm(COARSE_CFG, 2),
        c2f_cfg=C2F_CFG, c2f_params=init_lm(C2F_CFG, 3),
        coarse_chunk_size_s=0.1,  # 50 tokens @ 16kHz/hop32 -> small chunks
        coarse2fine_chunk_size_s=0.05,
    )
    return iface


def _sig(seconds=0.3, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 440 * t)
    return AudioSignal(x.astype(np.float32)[None, None, :], sr)


def test_s2t_t2s(interface):
    assert interface.s2t(1.0) == math.ceil(16000 / 32)
    assert abs(interface.s2t2s(1.0) - 1.0) < 0.01


def test_encode_shape(interface):
    codes = interface.encode(_sig(0.3))
    t_expected = math.ceil(0.3 * 16000 / 32)
    assert codes.shape[0] == 1 and codes.shape[1] == 6
    assert abs(codes.shape[2] - t_expected) <= 1
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()


def test_build_mask_shapes(interface):
    codes = interface.encode(_sig(0.3))
    mask = interface.build_mask(codes, periodic_prompt=7, upper_codebook_mask=3, seed=0)
    assert mask.shape == codes.shape
    m = np.asarray(mask)
    assert set(np.unique(m)) <= {0, 1}
    assert (m[:, 3:, :] == 1).all()  # upper codebook mask


def test_decode_roundtrip(interface):
    codes = interface.encode(_sig(0.3))
    sig = interface.decode(codes)
    assert sig.sample_rate == 16000
    assert sig.samples.shape[-1] == codes.shape[-1] * 32


def test_decode_silences_all_masked_frames(interface):
    codes = interface.encode(_sig(0.3))
    z = np.asarray(codes).copy()
    z[:, :, 3] = interface.coarse.mask_token
    sig = interface.decode(jnp.asarray(z))
    frame = sig.samples[0, 0, 3 * 32 : 4 * 32]
    np.testing.assert_array_equal(frame, 0)
    assert np.abs(sig.samples[0, 0, : 2 * 32]).sum() > 0


def test_coarse_vamp_multichunk(interface):
    codes = interface.encode(_sig(0.5))  # 250 tokens -> 5 chunks of 50
    mask = interface.build_mask(codes, periodic_prompt=5, upper_codebook_mask=2, seed=1)
    out = interface.coarse_vamp(codes, mask, seed=0, _sampling_steps=3)
    out = np.asarray(out)
    assert out.shape == codes.shape
    # fine codebooks pass through
    np.testing.assert_array_equal(out[:, 2:, :], np.asarray(codes)[:, 2:, :])
    # no mask tokens anywhere
    assert (out != interface.coarse.mask_token).all()


def test_coarse_vamp_preserves_unmasked(interface):
    codes = interface.encode(_sig(0.2))
    mask = np.zeros(codes.shape, dtype=np.int64)
    mask[:, :, 10:20] = 1  # regenerate only a window
    out = interface.coarse_vamp(codes, jnp.asarray(mask), seed=0, _sampling_steps=3)
    out = np.asarray(out)
    ref = np.asarray(codes)
    np.testing.assert_array_equal(out[:, :2, :8], ref[:, :2, :8])
    np.testing.assert_array_equal(out[:, :2, 22:], ref[:, :2, 22:])


def test_coarse_to_fine(interface):
    codes = interface.encode(_sig(0.3))
    mask = interface.build_mask(codes, upper_codebook_mask=2, seed=2)
    zv = interface.coarse_to_fine(codes, mask=mask, seed=0)
    zv = np.asarray(zv)
    assert zv.shape == codes.shape
    # conditioning codebooks untouched
    np.testing.assert_array_equal(zv[:, :2, :], np.asarray(codes)[:, :2, :])
    assert (zv != interface.c2f.mask_token).all()


def test_vamp_full_pipeline(interface):
    codes = interface.encode(_sig(0.3))
    mask = interface.build_mask(codes, periodic_prompt=7, upper_codebook_mask=2, seed=3)
    zv, mask_z = interface.vamp(
        codes, mask, batch_size=2, return_mask=True, seed=42, _sampling_steps=3
    )
    assert zv.shape == (2, 6, codes.shape[-1])
    assert mask_z.shape == (2, 6, codes.shape[-1])
    sig = interface.decode(zv)
    assert sig.samples.shape[0] == 2


def test_vamp_seed_reproducible(interface):
    codes = interface.encode(_sig(0.3))
    mask = interface.build_mask(codes, periodic_prompt=7, seed=3)
    z1 = interface.vamp(codes, mask, seed=7, _sampling_steps=3)
    z2 = interface.vamp(codes, mask, seed=7, _sampling_steps=3)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z3 = interface.vamp(codes, mask, seed=8, _sampling_steps=3)
    assert not np.array_equal(np.asarray(z1), np.asarray(z3))


def test_vamp_time_stretch(interface):
    codes = interface.encode(_sig(0.2))
    mask = interface.build_mask(codes, periodic_prompt=5, seed=0)
    zv = interface.vamp(codes, mask, time_stretch_factor=2, seed=1, _sampling_steps=2)
    assert zv.shape[-1] == codes.shape[-1] * 2


def test_vamp_e2e_single_dispatch(interface):
    sig = _sig(0.3)
    out = interface.vamp_e2e(
        sig, batch_size=2, seed=5, _sampling_steps=3, upper_codebook_mask=2
    )
    assert out.batch_size == 2
    assert out.sample_rate == 16000
    # length matches the padded-to-hop input
    assert out.samples.shape[-1] == interface._preprocess(sig).length
    # deterministic per seed
    out2 = interface.vamp_e2e(
        sig, batch_size=2, seed=5, _sampling_steps=3, upper_codebook_mask=2
    )
    np.testing.assert_array_equal(out.samples, out2.samples)


def test_vamp_e2e_int16_transfer_matches_fp32(interface):
    """PCM16 host-link transfer must match the fp32 path to 16-bit
    resolution wherever |sample| <= 1 (PCM clips above full scale).

    transfer_dtype="int16" moves BOTH directions as PCM16 (r5): feed input
    that is exactly PCM16-representable so encode sees identical samples on
    both paths and the only difference left is the output quantization."""
    sig = _sig(0.3)
    # mirror the device dequant bit-for-bit: int16 -> f32 -> * f32(1/32767)
    sig.samples = (
        np.round(np.clip(sig.samples, -1.0, 1.0) * 32767.0)
        .astype(np.int16).astype(np.float32) * np.float32(1.0 / 32767.0)
    )
    kw = dict(batch_size=2, seed=5, _sampling_steps=2, upper_codebook_mask=2)
    out16 = interface.vamp_e2e(sig, transfer_dtype="int16", **kw)
    out32 = interface.vamp_e2e(sig, transfer_dtype="float32", **kw)
    assert out32.samples.dtype == np.float32
    np.testing.assert_allclose(
        out16.samples, np.clip(out32.samples, -1.0, 1.0),
        atol=1.5 / 32767.0, rtol=0,
    )


def test_vamp_feedback_steps(interface):
    codes = interface.encode(_sig(0.2))
    mask = interface.build_mask(codes, periodic_prompt=5, seed=0)
    zv = interface.vamp(codes, mask, feedback_steps=2, seed=1, _sampling_steps=2)
    assert zv.shape == codes.shape


def test_interface_quantize_opt_in(interface):
    """interface.quantize() swaps LoRADense kernels for int8 + scales and the
    full two-stage vamp still runs (w8a8 serving opt-in)."""
    import copy

    import flax.traverse_util as tu

    iface = copy.copy(interface)  # don't quantize the shared fixture
    iface._gen_cache = dict(iface._gen_cache)  # nor clear its jit cache
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, seed=0)
    iface.quantize()
    flat = tu.flatten_dict(iface.coarse.params)
    assert ("transformer", "layers_0", "feed_forward", "w_1", "kernel_q") in flat
    assert iface.coarse.config.quantization == "int8"
    out = iface.vamp(z, mask, batch_size=1, seed=3, _sampling_steps=2)
    assert np.asarray(out).shape == (1, iface.c2f.n_codebooks, z.shape[-1])
    assert (np.asarray(out) != iface.c2f.mask_token).all()

    # idempotent: a second quantize() must not re-quantize the int8 tree
    # (kernel_q + scales through the quantizer would corrupt the params)
    params_before = iface.coarse.params
    assert iface.quantize() is iface
    assert iface.coarse.params is params_before


def test_codec_overrides_file_ctor(interface, tmp_path):
    """Interface(codec_overrides=...) flips runtime-only codec knobs
    (conv_impl, decoder_compute_dtype) on a saved checkpoint without touching
    the weights: encode codes are identical to the default schedule."""
    from vampnet_tpu.checkpoints import save_codec, save_lm

    save_codec(tmp_path / "codec.vtpu", CODEC_CFG, interface.codec_params)
    save_lm(tmp_path / "coarse.vtpu", COARSE_CFG, interface.coarse.params)

    iface_o = Interface(
        coarse_ckpt=str(tmp_path / "coarse.vtpu"),
        codec_ckpt=str(tmp_path / "codec.vtpu"),
        codec_overrides={
            "conv_impl": "matmul",
            "decoder_compute_dtype": "bfloat16",
        },
    )
    assert iface_o.codec_config.conv_impl == "matmul"
    assert iface_o.codec_config.decoder_compute_dtype == "bfloat16"

    sig = _sig(0.2)
    np.testing.assert_array_equal(
        np.asarray(iface_o.encode(sig)), np.asarray(interface.encode(sig))
    )
    # and the bf16 decoder produces a finite waveform
    z = iface_o.encode(sig)
    assert np.isfinite(np.asarray(iface_o.decode(z).samples)).all()
