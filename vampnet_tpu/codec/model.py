"""DAC/LAC-style neural audio codec, TPU-native in flax.

The reference outsources its tokenizer to the external `lac` package
(reference vampnet/interface.py:16: `from lac.model.lac import LAC as DAC`);
the capability surface used is:
    codec.preprocess(samples, sr)      (interface.py:215)
    codec.encode(samples, sr)["codes"] (interface.py:223)
    codec.decode(latents)["audio"]     (transformer.py:671-675)
    codec.quantizer.from_latents(...)  (transformer.py:672)
    codec.quantizer.quantizers[i].codebook.weight (layers.py:145)
    codec.sample_rate / codec.hop_length (interface.py:176-189)

This module reimplements that codec as an idiomatic JAX model: weight-norm
convolutions with snake activations (channels-last NWC layout so XLA tiles
conv+elementwise onto the MXU/VPU), a residual vector quantizer whose
nearest-neighbor search is a single cosine-similarity matmul per stage, and
encode/decode designed to run under one jit each.

Architecture follows the descript DAC family (encoder rates 2,4,8,8 -> hop
512; snake residual units with dilations 1,3,9; RVQ with per-stage in/out
projections and L2-normalized codebook lookup), which is what `lac` is.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import WNConv1d, WNConvTranspose1d, Snake1d


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    sample_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 14
    codebook_size: int = 1024
    codebook_dim: int = 8
    # conv compute dtype: "bfloat16" halves encode/decode HBM traffic; the
    # RVQ nearest-neighbor search always runs fp32 for code stability
    compute_dtype: str = "float32"
    # conv computation schedule: "xla" = lax.conv (the transposed convs pay
    # an 8x lhs-dilation FLOP penalty on the first decoder blocks);
    # "matmul" = im2col / framed / polyphase MXU matmuls (codec/layers.py)
    conv_impl: str = "xla"
    # decoder-only dtype override: decode in bf16 while encode stays fp32 —
    # the ENCODER's dtype decides the discrete codes (token parity with the
    # reference); the decoder only shapes the waveform, where bf16 noise
    # sits far below the codec's own reconstruction error. None = follow
    # compute_dtype.
    decoder_compute_dtype: str | None = None

    @property
    def hop_length(self) -> int:
        return math.prod(self.encoder_rates)

    @property
    def latent_dim(self) -> int:
        return self.encoder_dim * (2 ** len(self.encoder_rates))


class ResidualUnit(nn.Module):
    """Snake -> dilated conv(k7) -> Snake -> conv(k1), residual add."""

    dim: int
    dilation: int = 1
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(name="snake_1")(x)
        y = WNConv1d(self.dim, kernel_size=7, dilation=self.dilation, padding=pad,
                     dtype=self.dtype, impl=self.impl, name="conv_1")(y)
        y = Snake1d(name="snake_2")(y)
        y = WNConv1d(self.dim, kernel_size=1, dtype=self.dtype, impl=self.impl,
                     name="conv_2")(y)
        return x + y


class EncoderBlock(nn.Module):
    dim: int
    stride: int
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        ru = lambda dil, name: ResidualUnit(
            self.dim // 2, dilation=dil, dtype=self.dtype, impl=self.impl, name=name
        )
        x = ru(1, "res_1")(x)
        x = ru(3, "res_2")(x)
        x = ru(9, "res_3")(x)
        x = Snake1d(name="snake")(x)
        x = WNConv1d(
            self.dim, kernel_size=2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), dtype=self.dtype, impl=self.impl,
            name="conv",
        )(x)
        return x


class Encoder(nn.Module):
    config: CodecConfig

    @nn.compact
    def __call__(self, x):  # (b, t, 1) -> (b, t/hop, latent_dim)
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype)
        d = cfg.encoder_dim
        impl = cfg.conv_impl
        x = WNConv1d(d, kernel_size=7, padding=3, dtype=dt, impl=impl,
                     name="conv_in")(x)
        for i, stride in enumerate(cfg.encoder_rates):
            d *= 2
            x = EncoderBlock(d, stride, dtype=dt, impl=impl, name=f"block_{i}")(x)
        x = Snake1d(name="snake_out")(x)
        x = WNConv1d(cfg.latent_dim, kernel_size=3, padding=1, dtype=dt, impl=impl,
                     name="conv_out")(x)
        return x.astype(jnp.float32)


class DecoderBlock(nn.Module):
    output_dim: int
    stride: int
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = Snake1d(name="snake")(x)
        x = WNConvTranspose1d(
            self.output_dim, kernel_size=2 * self.stride, stride=self.stride,
            padding=math.ceil(self.stride / 2), dtype=self.dtype, impl=self.impl,
            name="conv_t",
        )(x)
        ru = lambda dil, name: ResidualUnit(
            self.output_dim, dilation=dil, dtype=self.dtype, impl=self.impl,
            name=name,
        )
        x = ru(1, "res_1")(x)
        x = ru(3, "res_2")(x)
        x = ru(9, "res_3")(x)
        return x


class Decoder(nn.Module):
    config: CodecConfig

    @nn.compact
    def __call__(self, z):  # (b, t/hop, latent_dim) -> (b, t, 1)
        cfg = self.config
        dt = jnp.dtype(cfg.decoder_compute_dtype or cfg.compute_dtype)
        d = cfg.decoder_dim
        impl = cfg.conv_impl
        x = WNConv1d(d, kernel_size=7, padding=3, dtype=dt, impl=impl,
                     name="conv_in")(z)
        for i, stride in enumerate(cfg.decoder_rates):
            out_dim = d // (2 ** (i + 1))
            x = DecoderBlock(out_dim, stride, dtype=dt, impl=impl,
                             name=f"block_{i}")(x)
        x = Snake1d(name="snake_out")(x)
        x = WNConv1d(1, kernel_size=7, padding=3, dtype=dt, impl=impl,
                     name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))


class VectorQuantize(nn.Module):
    """One RVQ stage: in_proj -> L2-normalized nearest-neighbor -> out_proj."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = WNConv1d(self.codebook_dim, kernel_size=1, name="in_proj")
        self.out_proj = WNConv1d(self.input_dim, kernel_size=1, name="out_proj")
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(stddev=1.0),
            (self.codebook_size, self.codebook_dim),
            jnp.float32,
        )

    def decode_latents(self, z_e):
        """Nearest codebook entries by cosine similarity — one matmul on the
        MXU per stage (replaces torch cdist)."""
        enc = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-8)
        cb = self.codebook / (
            jnp.linalg.norm(self.codebook, axis=-1, keepdims=True) + 1e-8
        )
        sim = jnp.einsum("btd,kd->btk", enc, cb, preferred_element_type=jnp.float32)
        indices = jnp.argmax(sim, axis=-1)
        z_q = self.codebook[indices]
        return z_q, indices

    def __call__(self, residual):
        z_e = self.in_proj(residual)  # (b, t, codebook_dim)
        z_q, indices = self.decode_latents(z_e)
        # straight-through for training
        commitment_loss = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)))
        codebook_loss = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_e)))
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        z_q_full = self.out_proj(z_q)
        return z_q_full, indices, z_e, commitment_loss, codebook_loss

    def embed_codes(self, codes):
        return self.codebook[codes]

    def decode_code_proj(self, codes):
        return self.out_proj(self.codebook[codes])


class ResidualVectorQuantize(nn.Module):
    """Stacked residual VQ (the `codec.quantizer` surface)."""

    input_dim: int
    n_codebooks: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.quantizers = [
            VectorQuantize(
                self.input_dim, self.codebook_size, self.codebook_dim,
                name=f"quantizers_{i}",
            )
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z, n_quantizers: int | None = None):
        n_q = n_quantizers if n_quantizers is not None else self.n_codebooks
        z_q = jnp.zeros_like(z)
        residual = z
        codes = []
        commitment_loss = 0.0
        codebook_loss = 0.0
        for i in range(n_q):
            z_q_i, idx, _z_e, c_loss, cb_loss = self.quantizers[i](residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(idx)
            commitment_loss = commitment_loss + c_loss
            codebook_loss = codebook_loss + cb_loss
        codes = jnp.stack(codes, axis=1)  # (b, n_codebooks, t)
        return z_q, codes, commitment_loss, codebook_loss

    def from_codes(self, codes):
        """codes (b, n_cb, t) -> summed projected z_q (b, t, input_dim)
        (reference lac quantizer.from_codes)."""
        n_cb = codes.shape[1]
        z_q = None
        for i in range(n_cb):
            z_q_i = self.quantizers[i].decode_code_proj(codes[:, i])
            z_q = z_q_i if z_q is None else z_q + z_q_i
        return z_q

    def from_latents(self, latents):
        """latents (b, t, n_cb*codebook_dim) -> summed projected z_q
        (reference vampnet/modules/transformer.py:672 uses this for decode)."""
        n_cb = latents.shape[-1] // self.codebook_dim
        z_q = None
        for i in range(n_cb):
            chunk = latents[..., i * self.codebook_dim : (i + 1) * self.codebook_dim]
            z_q_i = self.quantizers[i].out_proj(chunk)
            z_q = z_q_i if z_q is None else z_q + z_q_i
        return z_q

    def codebook_tables(self):
        """(n_codebooks, codebook_size, codebook_dim) — the LM embedding tables
        (reference vampnet/modules/layers.py:145)."""
        return jnp.stack([q.codebook for q in self.quantizers], axis=0)


class LAC(nn.Module):
    """Full codec. Channels-last audio: (b, t, 1) in, (b, t, 1) out."""

    config: CodecConfig = CodecConfig()

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, name="encoder")
        self.quantizer = ResidualVectorQuantize(
            input_dim=cfg.latent_dim,
            n_codebooks=cfg.n_codebooks,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            name="quantizer",
        )
        self.decoder = Decoder(cfg, name="decoder")

    @property
    def hop_length(self) -> int:
        return self.config.hop_length

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def encode(self, audio, n_quantizers: int | None = None):
        """audio (b, t, 1) -> dict with codes (b, n_cb, t/hop), z_q, latents."""
        z = self.encoder(audio)
        z_q, codes, commitment_loss, codebook_loss = self.quantizer(z, n_quantizers)
        return {
            "codes": codes,
            "z": z_q,
            "commitment_loss": commitment_loss,
            "codebook_loss": codebook_loss,
        }

    def decode(self, z_q):
        """z_q (b, t/hop, latent_dim) -> dict with audio (b, t, 1)."""
        return {"audio": self.decoder(z_q)}

    def decode_codes(self, codes):
        """codes -> waveform in one call (sampler/serving hot path)."""
        return self.decoder(self.quantizer.from_codes(codes))

    def decode_latents(self, latents):
        """Concatenated per-stage latents (b, t, n_cb*cb_dim) -> waveform
        (the reference decode path: quantizer.from_latents -> decoder)."""
        return self.decoder(self.quantizer.from_latents(latents))

    def __call__(self, audio, n_quantizers: int | None = None):
        out = self.encode(audio, n_quantizers)
        recon = self.decoder(out["z"])
        return {**out, "audio": recon}

    def codebook_tables(self):
        return self.quantizer.codebook_tables()

    def preprocess_length(self, length: int) -> int:
        """Right-pad target length to a hop multiple (reference lac preprocess)."""
        hop = self.config.hop_length
        return int(math.ceil(length / hop) * hop)
