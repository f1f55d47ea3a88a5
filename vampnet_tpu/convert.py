"""torch -> JAX weight conversion for the VampNet LM.

Translates the reference's checkpoint layout (audiotools BaseModel .pth files:
{"state_dict", "metadata"} or raw state dicts; loralib adapter dicts,
reference scripts/exp/train.py:399-419) into our flax parameter trees:

  torch Linear weight (out,in)            -> Dense kernel (in,out) = W.T
  torch Conv1d k=1 weight (out,in,1)      -> Dense kernel = W[:,:,0].T
  weight-norm (g,v) pairs                 -> collapsed to W = g*v/||v|| for the
                                             LM classifier (plain Dense here)
  loralib lora_A (r,in) / lora_B (out,r)  -> lora_a = A.T / lora_b = B.T
  embedding.special.MASK                  -> embedding.special_MASK

Layer mapping is validated against the mounted reference implementation in
tests/test_convert.py (same weights -> same logits).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .modules import LMConfig


def _load_torch_state_dict(path) -> Tuple[Dict[str, np.ndarray], dict]:
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as e:
        raise ValueError(
            f"{path} is neither a native .vtpu checkpoint nor a loadable torch "
            f"checkpoint ({type(e).__name__}: {e})"
        ) from e
    metadata = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        metadata = obj.get("metadata", {}) or {}
        obj = obj["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}
    return sd, metadata


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pref in ("module.", "_orig_mod."):
            while k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def _collapse_wn(sd: Dict[str, np.ndarray], base: str) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse torch weight-norm conv1d (g,v) to (W (out,in), bias)."""
    wv = sd[f"{base}.weight_v"][:, :, 0]
    wg = sd[f"{base}.weight_g"].reshape(-1)
    w = wg[:, None] * wv / np.linalg.norm(wv, axis=1, keepdims=True)
    return w, sd.get(f"{base}.bias")


def infer_lm_config(sd: Dict[str, np.ndarray], metadata: dict) -> LMConfig:
    """Build an LMConfig from checkpoint metadata, falling back to shape
    inference (the reference stores kwargs in BaseModel metadata)."""
    kwargs = dict(metadata.get("kwargs", {})) if metadata else {}
    n_layers = 0
    while f"transformer.layers.{n_layers}.norm_1.weight" in sd:
        n_layers += 1
    emb_dim = sd["transformer.norm.weight"].shape[0]
    special = sd["embedding.special.MASK"]
    n_codebooks, latent_dim = special.shape
    cls_out = (
        sd["classifier.layers.0.weight_v"].shape[0]
        if "classifier.layers.0.weight_v" in sd
        else sd["classifier.layers.0.weight"].shape[0]
    )
    lora_r = 0
    for k in sd:
        if k.endswith("lora_A"):
            lora_r = sd[k].shape[0]
            break
    vocab = int(kwargs.get("vocab_size", 1024))
    n_predict = cls_out // vocab
    cfg = LMConfig(
        n_heads=int(kwargs.get("n_heads", 20)),
        n_layers=n_layers,
        n_codebooks=n_codebooks,
        n_conditioning_codebooks=n_codebooks - n_predict,
        latent_dim=latent_dim,
        embedding_dim=emb_dim,
        vocab_size=vocab,
        dropout=float(kwargs.get("dropout", 0.1)),
        lora_r=lora_r,
    )
    return cfg


def lm_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: LMConfig) -> Any:
    import flax.traverse_util as tu

    flat: Dict[Tuple[str, ...], jnp.ndarray] = {}

    def put(path, arr):
        flat[path] = jnp.asarray(arr)

    put(("embedding", "special_MASK"), sd["embedding.special.MASK"])
    put(("embedding", "out_proj", "kernel"), sd["embedding.out_proj.weight"][:, :, 0].T)
    put(("embedding", "out_proj", "bias"), sd["embedding.out_proj.bias"])

    if "classifier.layers.0.weight_v" in sd:
        w, b = _collapse_wn(sd, "classifier.layers.0")
    else:
        w, b = sd["classifier.layers.0.weight"][:, :, 0], sd.get("classifier.layers.0.bias")
    # reference classifier channels are vocab-major ("b (p c) t",
    # transformer.py:634); ours are codebook-major so the forward needs no
    # minor-dim logits transpose — permute the out-channels here instead
    n_out = w.shape[0]
    v = cfg.vocab_size
    n_pred = n_out // v
    perm = (np.arange(n_out) % v) * n_pred + (np.arange(n_out) // v)
    put(("classifier", "kernel"), w[perm].T)
    if b is not None:
        put(("classifier", "bias"), b[perm])

    def put_linear(ours, ref):
        put(ours + ("kernel",), sd[f"{ref}.weight"].T)
        if f"{ref}.lora_A" in sd and cfg.lora_r:
            put(ours + ("lora_a",), sd[f"{ref}.lora_A"].T)
            put(ours + ("lora_b",), sd[f"{ref}.lora_B"].T)

    for i in range(cfg.n_layers):
        p = f"transformer.layers.{i}"
        o = ("transformer", f"layers_{i}")
        put(o + ("norm_1", "weight"), sd[f"{p}.norm_1.weight"])
        put(o + ("norm_3", "weight"), sd[f"{p}.norm_3.weight"])
        for name in ("w_qs", "w_ks", "w_vs", "fc"):
            put_linear(o + ("self_attn", name), f"{p}.self_attn.{name}")
        if i == 0:
            put(
                o + ("self_attn", "relative_attention_bias"),
                sd[f"{p}.self_attn.relative_attention_bias.weight"],
            )
        put_linear(o + ("feed_forward", "w_1"), f"{p}.feed_forward.w_1")
        put_linear(o + ("feed_forward", "w_2"), f"{p}.feed_forward.w_2")
    put(("transformer", "norm", "weight"), sd["transformer.norm.weight"])

    # control encoder (sketch2sound), if present
    for k in sd:
        if k.startswith("ctrl_encoder.ctrl_encoders."):
            name = k.split(".")[2]
            if k.endswith(".weight"):
                put(("ctrl_encoder", f"ctrl_{name}", "kernel"), sd[k].T)
            elif k.endswith(".bias"):
                put(("ctrl_encoder", f"ctrl_{name}", "bias"), sd[k])

    return tu.unflatten_dict(flat)


def lm_from_torch_checkpoint(path) -> Tuple[LMConfig, Any]:
    sd, metadata = _load_torch_state_dict(path)
    sd = _strip_prefixes(sd)
    cfg = infer_lm_config(sd, metadata)
    return cfg, lm_params_from_state_dict(sd, cfg)


def lora_from_torch_checkpoint(path) -> Any:
    """loralib adapter-only state dict -> our lora_a/lora_b overlay tree."""
    import flax.traverse_util as tu

    sd, _ = _load_torch_state_dict(path)
    sd = _strip_prefixes(sd)
    flat = {}
    for k, v in sd.items():
        if not (k.endswith("lora_A") or k.endswith("lora_B")):
            continue
        parts = k.split(".")
        # transformer.layers.0.self_attn.w_qs.lora_A
        assert parts[0] == "transformer", f"unexpected lora key {k}"
        layer = parts[2]
        leaf = "lora_a" if parts[-1] == "lora_A" else "lora_b"
        path_t = ("transformer", f"layers_{layer}") + tuple(parts[3:-1]) + (leaf,)
        flat[path_t] = jnp.asarray(v.T)
    return tu.unflatten_dict(flat)
