"""Codec converter test: build a torch model with the DAC-family layout
(the layout `lac` checkpoints use), convert its state dict, and check
encode/decode numerics parity against the flax codec."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.codec.convert import codec_from_torch_checkpoint, infer_codec_config

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

WN = torch.nn.utils.weight_norm


class TSnake(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, ch, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class TResUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            TSnake(dim),
            WN(nn.Conv1d(dim, dim, 7, dilation=dilation, padding=pad)),
            TSnake(dim),
            WN(nn.Conv1d(dim, dim, 1)),
        )

    def forward(self, x):
        return x + self.block(x)


class TEncBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            TResUnit(dim // 2, 1),
            TResUnit(dim // 2, 3),
            TResUnit(dim // 2, 9),
            TSnake(dim // 2),
            WN(nn.Conv1d(dim // 2, dim, 2 * stride, stride=stride,
                         padding=math.ceil(stride / 2))),
        )

    def forward(self, x):
        return self.block(x)


class TDecBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            TSnake(in_dim),
            WN(nn.ConvTranspose1d(in_dim, out_dim, 2 * stride, stride=stride,
                                  padding=math.ceil(stride / 2))),
            TResUnit(out_dim, 1),
            TResUnit(out_dim, 3),
            TResUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class TVQ(nn.Module):
    def __init__(self, input_dim, size, dim):
        super().__init__()
        self.in_proj = WN(nn.Conv1d(input_dim, dim, 1))
        self.out_proj = WN(nn.Conv1d(dim, input_dim, 1))
        self.codebook = nn.Embedding(size, dim)


class TCodec(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        d = cfg.encoder_dim
        enc = [WN(nn.Conv1d(1, d, 7, padding=3))]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(TEncBlock(d, s))
        enc += [TSnake(d), WN(nn.Conv1d(d, cfg.latent_dim, 3, padding=1))]
        self.encoder = nn.Module()
        self.encoder.block = nn.Sequential(*enc)

        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            [TVQ(cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim)
             for _ in range(cfg.n_codebooks)]
        )

        dd = cfg.decoder_dim
        dec = [WN(nn.Conv1d(cfg.latent_dim, dd, 7, padding=3))]
        cur = dd
        for i, s in enumerate(cfg.decoder_rates):
            out = dd // (2 ** (i + 1))
            dec.append(TDecBlock(cur, out, s))
            cur = out
        dec += [TSnake(cur), WN(nn.Conv1d(cur, 1, 7, padding=3)), nn.Tanh()]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*dec)


CFG = CodecConfig(
    sample_rate=16000, encoder_dim=8, encoder_rates=(2, 4),
    decoder_dim=32, decoder_rates=(4, 2), n_codebooks=3,
    codebook_size=16, codebook_dim=4,
)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TCodec(CFG).eval()
    path = tmp_path_factory.mktemp("ckpt") / "codec.pth"
    torch.save(
        {"state_dict": tmodel.state_dict(),
         "metadata": {"kwargs": {"sample_rate": 16000}}},
        path,
    )
    cfg, params = codec_from_torch_checkpoint(path)
    return tmodel, cfg, params


def test_config_inference(converted):
    _, cfg, _ = converted
    assert cfg == CFG


def test_encoder_parity(converted):
    tmodel, cfg, params = converted
    model = LAC(cfg)
    x = torch.randn(1, 1, cfg.hop_length * 8) * 0.3
    with torch.no_grad():
        z_ref = tmodel.encoder.block(x).numpy()
    z = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)),
        method=lambda m, a: m.encoder(a),
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1), z_ref, atol=2e-4, rtol=1e-3
    )


def test_decoder_parity(converted):
    tmodel, cfg, params = converted
    model = LAC(cfg)
    zq = torch.randn(1, cfg.latent_dim, 8) * 0.5
    with torch.no_grad():
        a_ref = tmodel.decoder.model(zq).numpy()
    a = model.apply(
        {"params": params}, jnp.asarray(zq.numpy().transpose(0, 2, 1)),
        method="decode",
    )["audio"]
    np.testing.assert_allclose(
        np.asarray(a).transpose(0, 2, 1), a_ref, atol=2e-4, rtol=1e-3
    )


def test_codebooks_transferred(converted):
    tmodel, cfg, params = converted
    model = LAC(cfg)
    tables = model.apply({"params": params}, method="codebook_tables")
    for i in range(cfg.n_codebooks):
        np.testing.assert_allclose(
            np.asarray(tables[i]),
            tmodel.quantizer.quantizers[i].codebook.weight.detach().numpy(),
        )
