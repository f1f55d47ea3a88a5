"""Full-shape conversion rehearsal (weight-day de-risking).

Round-1 converter parity ran only at toy scale (2 layers / 64 dim). Here we
construct reference-layout torch checkpoints at the REAL shipped scale —
coarse 20L/20H/1280d/4cb, c2f 16L/14cb(4 cond), LAC codec 64/1536 dims with
rates (2,4,8,8)/14cb/1024/8 (reference conf/vampnet.yml, conf/c2f.yml,
scripts/exp/train.py:408-419) — run both converters, and assert numerics
parity. Layout surprises (weight-norm collapse, vocab-major classifier,
loralib adapter naming) surface here instead of on weight day.

Marked slow: builds ~600M params of torch modules on the CPU.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.codec.convert import codec_from_torch_checkpoint
from vampnet_tpu.convert import lm_from_torch_checkpoint, lora_from_torch_checkpoint
from vampnet_tpu.modules import VampNetLM

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

# the two shipped LM configs (SURVEY.md §2.4)
COARSE_KW = dict(
    n_heads=20, n_layers=20, n_codebooks=4, n_conditioning_codebooks=0,
    latent_dim=8, embedding_dim=1280, vocab_size=1024,
)
C2F_KW = dict(
    n_heads=20, n_layers=16, n_codebooks=14, n_conditioning_codebooks=4,
    latent_dim=8, embedding_dim=1280, vocab_size=1024,
)


class _CB:
    def __init__(self, w):
        self.codebook = torch.nn.Embedding.from_pretrained(w)


class _Codec:
    def __init__(self, ws):
        self.quantizer = type("Q", (), {"quantizers": [_CB(w) for w in ws]})()


def _rehearse_lm(tmp_path, kw, t=16, seed=0):
    reft = pytest.importorskip("tests.reference_harness")
    mod = reft.load_reference_transformer()
    torch.manual_seed(seed)
    ref = mod.VampNet(flash_attn=False, dropout=0.0, **kw).eval()
    path = tmp_path / "lm.pth"
    torch.save(
        {"state_dict": ref.state_dict(),
         "metadata": {"kwargs": dict(kw, flash_attn=False, dropout=0.0)}},
        path,
    )

    cfg, params = lm_from_torch_checkpoint(path)
    assert cfg.n_layers == kw["n_layers"]
    assert cfg.n_codebooks == kw["n_codebooks"]
    assert cfg.n_conditioning_codebooks == kw["n_conditioning_codebooks"]
    assert cfg.embedding_dim == kw["embedding_dim"]
    assert cfg.vocab_size == kw["vocab_size"]
    model = VampNetLM(cfg)

    n_cb, v, ld = kw["n_codebooks"], kw["vocab_size"], kw["latent_dim"]
    n_infer = n_cb - kw["n_conditioning_codebooks"]
    torch.manual_seed(seed + 1)
    cb_t = [torch.randn(v, ld) for _ in range(n_cb)]
    codes_np = np.random.default_rng(seed).integers(0, v, (1, n_cb, t))
    codes_np[:, kw["n_conditioning_codebooks"]:, ::3] = v  # MASK in inferred cbs

    with torch.no_grad():
        latents = ref.embedding.from_codes(torch.tensor(codes_np), _Codec(cb_t))
        ref_logits = ref(latents).numpy()  # (1, vocab, t*n_infer)

    codebooks = jnp.stack([jnp.asarray(w.numpy()) for w in cb_t])
    logits = model.apply(
        {"params": params}, jnp.asarray(codes_np), codebooks, method="forward_codes"
    )
    ours = np.asarray(jnp.transpose(logits.reshape(1, t * n_infer, v), (0, 2, 1)))
    assert ours.shape == ref_logits.shape
    c = np.corrcoef(ours.ravel(), ref_logits.ravel())[0, 1]
    assert c > 0.999, f"full-scale logits corr {c}"
    # corr can hide a global affine offset; check absolute error too. Our
    # stack computes in bf16 (the ref here runs fp32), so allow a small
    # rounding tail at 20-layer depth but pin the bulk tightly.
    err = np.abs(ours - ref_logits)
    assert err.max() < 0.1, f"max err {err.max()}"
    assert np.quantile(err, 0.999) < 0.03, f"p99.9 err {np.quantile(err, 0.999)}"
    return cfg


def test_fullscale_coarse_conversion(tmp_path):
    _rehearse_lm(tmp_path, COARSE_KW)


def test_fullscale_c2f_conversion(tmp_path):
    _rehearse_lm(tmp_path, C2F_KW)


def test_fullscale_codec_conversion(tmp_path):
    from tests.test_codec_convert import TCodec

    cfg_real = CodecConfig(sample_rate=44100)  # defaults ARE the LAC shape
    assert cfg_real.encoder_rates == (2, 4, 8, 8)
    assert cfg_real.n_codebooks == 14 and cfg_real.codebook_size == 1024
    torch.manual_seed(0)
    tmodel = TCodec(cfg_real).eval()
    path = tmp_path / "codec.pth"
    torch.save(
        {"state_dict": tmodel.state_dict(),
         "metadata": {"kwargs": {"sample_rate": 44100}}},
        path,
    )
    cfg, params = codec_from_torch_checkpoint(path)
    assert cfg == cfg_real

    model = LAC(cfg)
    x = torch.randn(1, 1, cfg.hop_length * 4) * 0.3
    with torch.no_grad():
        z_ref = tmodel.encoder.block(x).numpy()
    z = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)),
        method=lambda m, a: m.encoder(a),
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1), z_ref, atol=5e-4, rtol=1e-3
    )

    zq = torch.randn(1, cfg.latent_dim, 4) * 0.5
    with torch.no_grad():
        a_ref = tmodel.decoder.model(zq).numpy()
    a = model.apply(
        {"params": params}, jnp.asarray(zq.numpy().transpose(0, 2, 1)),
        method="decode",
    )["audio"]
    np.testing.assert_allclose(
        np.asarray(a).transpose(0, 2, 1), a_ref, atol=5e-4, rtol=1e-3
    )

    tables = model.apply({"params": params}, method="codebook_tables")
    for i in range(cfg.n_codebooks):
        np.testing.assert_allclose(
            np.asarray(tables[i]),
            tmodel.quantizer.quantizers[i].codebook.weight.detach().numpy(),
        )


def test_fullscale_wavebeat_conversion(tmp_path):
    """wavebeat converter at the PUBLISHED model scale (8 blocks, width 32,
    growth 32, kernel 15, stride 2, dilation cycle (1, 8) @ 22.05 kHz —
    reference `wavebeat` dsTCNModel defaults, vampnet/beats.py:203-223):
    Lightning checkpoint -> BN-folded flax, forward parity, then the native
    .vtpu round-trip the weight-day pipeline writes."""
    from tests.test_wavebeat import TDsTCN

    from vampnet_tpu.checkpoints import load_wavebeat, save_wavebeat
    from vampnet_tpu.wavebeat import DsTCN, dstcn_from_torch_checkpoint

    hp = dict(
        ninputs=1, noutputs=2, nblocks=8, kernel_size=15, stride=2,
        dilation_growth=8, dilation_cycle=2, channel_width=32,
        channel_growth=32, sample_rate=22050,
    )
    torch.manual_seed(0)
    tmodel = TDsTCN(hp).eval()
    path = tmp_path / "wavebeat.pth"
    torch.save({"state_dict": tmodel.state_dict(), "hyper_parameters": hp}, path)

    cfg, params = dstcn_from_torch_checkpoint(path)
    assert len(cfg.blocks) == 8
    assert cfg.blocks[0].out_ch == 32 and cfg.blocks[-1].out_ch == 32 + 7 * 32
    assert cfg.total_stride == 256  # ~86 fps activations at 22.05 kHz

    x = torch.randn(1, 1, 2 ** 14) * 0.1
    with torch.no_grad():
        ref = tmodel(x).numpy()
    ours = DsTCN(cfg).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1))
    )
    ours = np.asarray(ours).transpose(0, 2, 1)
    t = min(ours.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(ours[..., :t], ref[..., :t], atol=2e-4, rtol=1e-3)

    native = tmp_path / "wavebeat.vtpu"
    save_wavebeat(native, cfg, params)
    cfg2, params2 = load_wavebeat(native)
    assert cfg2 == cfg
    ours2 = DsTCN(cfg2).apply(
        {"params": params2}, jnp.asarray(x.numpy().transpose(0, 2, 1))
    )
    np.testing.assert_array_equal(np.asarray(ours2), np.asarray(
        DsTCN(cfg).apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    ))


def test_fullscale_lora_adapter_shapes(tmp_path):
    """loralib adapter dict at real scale (r=8 on q/v/out + FFN w_1/w_2,
    reference transformer.py:22,67-68,109-114) converts to overlay leaves of
    the exact shapes our full-scale model carries."""
    r, d = 8, COARSE_KW["embedding_dim"]
    sd = {}
    for i in range(COARSE_KW["n_layers"]):
        p = f"transformer.layers.{i}"
        for name, out in (("self_attn.w_qs", d), ("self_attn.w_vs", d),
                          ("self_attn.fc", d)):
            sd[f"{p}.{name}.lora_A"] = torch.randn(r, d)
            sd[f"{p}.{name}.lora_B"] = torch.zeros(out, r)
        # reference FeedForward: w_1 d->4d, GEGLU halves, w_2 2d->d
        sd[f"{p}.feed_forward.w_1.lora_A"] = torch.randn(r, d)
        sd[f"{p}.feed_forward.w_1.lora_B"] = torch.zeros(d * 4, r)
        sd[f"{p}.feed_forward.w_2.lora_A"] = torch.randn(r, d * 2)
        sd[f"{p}.feed_forward.w_2.lora_B"] = torch.zeros(d, r)
    path = tmp_path / "lora.pth"
    torch.save(sd, path)
    tree = lora_from_torch_checkpoint(path)

    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree)
    assert len(flat) == COARSE_KW["n_layers"] * 5 * 2
    for i in range(COARSE_KW["n_layers"]):
        o = ("transformer", f"layers_{i}")
        assert flat[o + ("self_attn", "w_qs", "lora_a")].shape == (d, r)
        assert flat[o + ("self_attn", "w_qs", "lora_b")].shape == (r, d)
        assert flat[o + ("feed_forward", "w_2", "lora_a")].shape == (d * 2, r)
        assert flat[o + ("feed_forward", "w_2", "lora_b")].shape == (r, d)
