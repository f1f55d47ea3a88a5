"""Control-signal (sketch2sound) tests: extractors, controller registry,
ControlEncoder conditioning, and the ctrls-CFG generation path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.control import (
    CONTROLLERS,
    HarmonicChromaControl,
    RMSControl,
    Sketch2SoundController,
    median_filter_1d,
    rms,
)
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.sampling import build_generate_fn


def _wav(b=1, seconds=0.5, sr=44100, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    return jnp.asarray(np.tile(x[None], (b, 1)).astype(np.float32))


def test_rms_envelope():
    wav = _wav()
    ctl = RMSControl(hop_length=512, sample_rate=44100)
    out = ctl.extract(wav)
    assert out.shape == (1, wav.shape[1] // 512, 1)
    # ~0.5 amplitude sine -> rms ~0.35
    assert abs(float(out[:, 5:-5].mean()) - 0.354) < 0.03


def test_rms_quantized():
    ctl = RMSControl(hop_length=512, n_quantize=16)
    out = ctl.extract(_wav())
    vals = np.unique(np.round(np.asarray(out) * 16))
    assert len(vals) <= 17  # quantized to 16 steps


def test_median_filter():
    x = jnp.asarray([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0]])
    out = median_filter_1d(x, 3)
    np.testing.assert_allclose(np.asarray(out)[0, 1:-1], 1.0)


def test_harmonic_chroma_peaks_at_note():
    # A440 should excite chroma bin for A
    ctl = HarmonicChromaControl(hop_length=512, n_chroma=12, top_n=2, sample_rate=44100)
    out = np.asarray(ctl.extract(_wav(seconds=1.0)))
    assert out.shape[-1] == 12
    mid = out[0, out.shape[1] // 2]
    assert mid.max() > 0.3  # a dominant bin exists
    # energy concentrated on <= top_n bins
    assert (mid > 0.1).sum() <= 2


def test_controller_registry_and_masks():
    c = Sketch2SoundController(["rmsq16", "rms-median"], hop_length=512, sample_rate=44100)
    assert c.ctrl_dims == {"rmsq16": 1, "rms-median": 1}
    ctrls = c.extract(_wav(b=2))
    assert set(ctrls) == {"rmsq16", "rms-median"}
    masks = c.random_mask(ctrls, 0.5, jax.random.PRNGKey(0))
    for k, m in masks.items():
        assert m.shape == ctrls[k].shape[:2]
        assert set(np.unique(np.asarray(m))) <= {0, 1}
    empty = c.empty_mask(ctrls)
    assert all(int(m.sum()) == 0 for m in empty.values())

    with pytest.raises(AssertionError, match="unsupported control key"):
        Sketch2SoundController(["nope"], 512, 44100)


def _ctrl_model(t=16):
    cfg = LMConfig(
        n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4, embedding_dim=32,
        vocab_size=32, dropout=0.0, ctrl_dims=(("rms", 1),),
    )
    model = VampNetLM(cfg)
    codes = jnp.zeros((2, 2, t), jnp.int32)
    cbs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 4))
    ctrls = {"rms": jax.random.uniform(jax.random.PRNGKey(1), (2, t, 1))}
    masks = {"rms": jnp.ones((2, t), jnp.int32)}
    params = model.init(
        jax.random.PRNGKey(2), codes, cbs, ctrls, masks, method="forward_codes"
    )["params"]
    return cfg, model, params, cbs, codes, ctrls, masks


def test_ctrl_encoder_changes_logits():
    cfg, model, params, cbs, codes, ctrls, masks = _ctrl_model()
    l1 = model.apply({"params": params}, codes, cbs, ctrls, masks, method="forward_codes")
    blank = {"rms": jnp.zeros_like(masks["rms"])}
    l2 = model.apply({"params": params}, codes, cbs, ctrls, blank, method="forward_codes")
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_generate_with_ctrls_cfg():
    cfg, model, params, cbs, codes, ctrls, masks = _ctrl_model()
    gen = build_generate_fn(model, sampling_steps=2, typical_filtering=False)
    mask = jnp.ones_like(codes)
    out = gen(params, cbs, jax.random.PRNGKey(0), codes, mask, 1.0, 10.5, 0.0, 1.0,
              ctrls, masks, 3.0)
    out = np.asarray(out)
    assert out.shape == codes.shape
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
    # guidance scale changes the outcome
    out2 = gen(params, cbs, jax.random.PRNGKey(0), codes, mask, 1.0, 10.5, 0.0, 1.0,
               ctrls, masks, 0.0)
    assert not np.array_equal(out, np.asarray(out2))
