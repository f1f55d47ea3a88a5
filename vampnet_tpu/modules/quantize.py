"""Post-training int8 weight quantization for the VampNet LM.

The transformer's q/k/v/out and FFN projections (>95% of LM FLOPs) switch to
w8a8: int8 weights with per-output-channel symmetric scales, activations
dynamically quantized per row inside the matmul (modules/lora.py LoRADense
quantize=True). The embedding projection and classifier stay bf16 — they're
small and the classifier's logit fidelity drives sampling.

Usage:
    qcfg = dataclasses.replace(cfg, quantization="int8")
    qparams = quantize_lm_params(params)
    logits = VampNetLM(qcfg).apply({"params": qparams}, ...)
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

# module names whose `kernel` leaves are quantized (LoRADense sites)
QUANT_MODULES = ("w_qs", "w_ks", "w_vs", "fc", "w_1", "w_2")


def quantize_kernel(kernel) -> tuple:
    """fp kernel (in, out) -> (int8 kernel_q, f32 per-out-channel scale)."""
    k = np.asarray(kernel, dtype=np.float32)
    scale = np.abs(k).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))


def quantize_lm_params(params) -> Any:
    """Replace fp kernels at LoRADense sites with kernel_q + kernel_scale."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == "kernel" and len(path) >= 2 and path[-2] in QUANT_MODULES:
            q, s = quantize_kernel(leaf)
            out[path[:-1] + ("kernel_q",)] = q
            out[path[:-1] + ("kernel_scale",)] = s
        else:
            out[path] = leaf
    return tu.unflatten_dict(out)
