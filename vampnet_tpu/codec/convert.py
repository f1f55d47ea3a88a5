"""torch -> JAX weight conversion for the LAC/DAC codec.

The reference loads `codec.pth` through the external `lac` package
(reference vampnet/interface.py:16,70). This converter understands the
DAC-family torch layout (nested Sequential blocks with weight-norm convs and
snake activations, RVQ with per-stage in/out projections):

  encoder.block.0                  -> encoder/conv_in
  encoder.block.{i+1}.block.{0..2} -> encoder/block_{i}/res_{1..3}
  encoder.block.{i+1}.block.3      -> encoder/block_{i}/snake
  encoder.block.{i+1}.block.4      -> encoder/block_{i}/conv
  decoder.model.*                  -> decoder/* (mirrored)
  quantizer.quantizers.{i}.*       -> quantizer/quantizers_{i}/*

Weight-norm (g,v) pairs are preserved (not collapsed) since our codec layers
keep the same parametrization; snake alphas reshape (1,C,1) -> (C,).
Validated against a torch reimplementation of the same graph in
tests/test_codec_convert.py.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .model import CodecConfig


from ..convert import _load_torch_state_dict  # shared torch-checkpoint loader


def infer_codec_config(sd: Dict[str, np.ndarray], metadata: dict) -> CodecConfig:
    kwargs = dict(metadata.get("kwargs", {})) if metadata else {}
    n_cb = 0
    while f"quantizer.quantizers.{n_cb}.codebook.weight" in sd:
        n_cb += 1
    codebook_size, codebook_dim = sd["quantizer.quantizers.0.codebook.weight"].shape
    encoder_dim = sd["encoder.block.0.weight_v"].shape[0]
    # count encoder blocks & strides from conv kernel sizes (k = 2*stride)
    rates = []
    i = 1
    while f"encoder.block.{i}.block.4.weight_v" in sd:
        k = sd[f"encoder.block.{i}.block.4.weight_v"].shape[2]
        rates.append(k // 2)
        i += 1
    decoder_dim = sd["decoder.model.0.weight_v"].shape[0]
    dec_rates = []
    i = 1
    while f"decoder.model.{i}.block.1.weight_v" in sd:
        k = sd[f"decoder.model.{i}.block.1.weight_v"].shape[2]
        dec_rates.append(k // 2)
        i += 1
    return CodecConfig(
        sample_rate=int(kwargs.get("sample_rate", 44100)),
        encoder_dim=encoder_dim,
        encoder_rates=tuple(rates),
        decoder_dim=decoder_dim,
        decoder_rates=tuple(dec_rates),
        n_codebooks=n_cb,
        codebook_size=codebook_size,
        codebook_dim=codebook_dim,
    )


def _put_wn_conv(flat, path, sd, base, transpose=False):
    v = sd[f"{base}.weight_v"]
    g = sd[f"{base}.weight_g"].reshape(-1)
    flat[path + ("v",)] = jnp.asarray(v)
    flat[path + ("g",)] = jnp.asarray(g)
    if f"{base}.bias" in sd:
        flat[path + ("bias",)] = jnp.asarray(sd[f"{base}.bias"])


def _put_snake(flat, path, sd, base):
    flat[path + ("alpha",)] = jnp.asarray(sd[f"{base}.alpha"].reshape(-1))


def _put_res_unit(flat, path, sd, base):
    _put_snake(flat, path + ("snake_1",), sd, f"{base}.block.0")
    _put_wn_conv(flat, path + ("conv_1",), sd, f"{base}.block.1")
    _put_snake(flat, path + ("snake_2",), sd, f"{base}.block.2")
    _put_wn_conv(flat, path + ("conv_2",), sd, f"{base}.block.3")


def codec_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: CodecConfig) -> Any:
    import flax.traverse_util as tu

    flat: Dict[Tuple[str, ...], jnp.ndarray] = {}

    # encoder
    _put_wn_conv(flat, ("encoder", "conv_in"), sd, "encoder.block.0")
    n_enc = len(cfg.encoder_rates)
    for i in range(n_enc):
        base = f"encoder.block.{i + 1}"
        p = ("encoder", f"block_{i}")
        for j in range(3):
            _put_res_unit(flat, p + (f"res_{j + 1}",), sd, f"{base}.block.{j}")
        _put_snake(flat, p + ("snake",), sd, f"{base}.block.3")
        _put_wn_conv(flat, p + ("conv",), sd, f"{base}.block.4")
    _put_snake(flat, ("encoder", "snake_out"), sd, f"encoder.block.{n_enc + 1}")
    _put_wn_conv(flat, ("encoder", "conv_out"), sd, f"encoder.block.{n_enc + 2}")

    # quantizer
    for i in range(cfg.n_codebooks):
        base = f"quantizer.quantizers.{i}"
        p = ("quantizer", f"quantizers_{i}")
        _put_wn_conv(flat, p + ("in_proj",), sd, f"{base}.in_proj")
        _put_wn_conv(flat, p + ("out_proj",), sd, f"{base}.out_proj")
        flat[p + ("codebook",)] = jnp.asarray(sd[f"{base}.codebook.weight"])

    # decoder
    _put_wn_conv(flat, ("decoder", "conv_in"), sd, "decoder.model.0")
    n_dec = len(cfg.decoder_rates)
    for i in range(n_dec):
        base = f"decoder.model.{i + 1}"
        p = ("decoder", f"block_{i}")
        _put_snake(flat, p + ("snake",), sd, f"{base}.block.0")
        _put_wn_conv(flat, p + ("conv_t",), sd, f"{base}.block.1", transpose=True)
        for j in range(3):
            _put_res_unit(flat, p + (f"res_{j + 1}",), sd, f"{base}.block.{j + 2}")
    _put_snake(flat, ("decoder", "snake_out"), sd, f"decoder.model.{n_dec + 1}")
    _put_wn_conv(flat, ("decoder", "conv_out"), sd, f"decoder.model.{n_dec + 2}")

    # in-proj conv1d (k=1) weight_v for VQ: torch (out,in,1); ours expects
    # (out,in,k) — identical, nothing to do.
    return tu.unflatten_dict(flat)


def codec_from_torch_checkpoint(path) -> Tuple[CodecConfig, Any]:
    sd, metadata = _load_torch_state_dict(path)
    cfg = infer_codec_config(sd, metadata)
    return cfg, codec_params_from_state_dict(sd, cfg)
