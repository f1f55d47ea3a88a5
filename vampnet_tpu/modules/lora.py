"""LoRA as a first-class parameter-overlay (reference: loralib usage at
vampnet/modules/transformer.py:22,67-68,109-114).

A `LoRADense` is a bias-free Dense with optional rank-r adapters. Adapter
params live in the same "params" tree under `lora_a`/`lora_b` leaves so that:
  * `lora_param_filter` builds an optax mask that trains only adapters
    (reference scripts/exp/train.py:696 `mark_only_lora_as_trainable`), and
  * `lora_state_dict` extracts an adapter-only checkpoint
    (reference scripts/exp/train.py:404-406).

Init matches loralib: lora_a ~ he_uniform, lora_b = 0, scaling = alpha/r, so a
freshly-added adapter is a no-op.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

LORA_R = 8  # reference vampnet/modules/transformer.py:22


class LoRADense(nn.Module):
    features: int
    r: int = 0
    alpha: float = 1.0
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    quantize: bool = False  # int8 weights + per-out-channel scales
    # return the kernel param instead of computing x @ kernel — lets a parent
    # feed the weight into a fused Pallas kernel (ops/ffn_kernel.py) while the
    # param tree stays identical to the normal path. Only valid at apply time
    # with r == 0 and quantize == False. `in_features` overrides the shape
    # inference when the exposing caller's x is not this layer's input.
    expose_kernel: bool = False
    in_features: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = self.in_features or x.shape[-1]
        if self.expose_kernel:
            assert self.r == 0 and not self.quantize and not self.use_bias
            return self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_features, self.features),
                self.param_dtype,
            )
        if self.quantize:
            # w8a8: int8 weights (HBM halved vs bf16, 2x MXU peak on v5e) with
            # per-output-channel scales; activations dynamically quantized
            # per row, fused in one Pallas kernel (ops/int8_matmul.py) so the
            # quant passes never hit HBM. Populate via
            # modules.quantize.quantize_lm_params.
            from ..ops.int8_matmul import w8a8_matmul

            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros,
                (in_features, self.features), jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            y = w8a8_matmul(x, kernel_q, kernel_scale, out_dtype=self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_features, self.features),
                self.param_dtype,
            )
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.r > 0:
            lora_a = self.param(
                "lora_a", nn.initializers.he_uniform(), (in_features, self.r), self.param_dtype
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (self.r, self.features), self.param_dtype
            )
            scale = self.alpha / self.r
            y = y + jnp.dot(
                jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)),
                lora_b.astype(self.dtype),
            ) * scale
        return y


def _is_lora_path(path) -> bool:
    return any(getattr(k, "key", None) in ("lora_a", "lora_b") for k in path)


def lora_param_filter(params) -> Any:
    """Pytree of bools: True at LoRA leaves. Feed to `optax.masked` to train
    only adapters during fine-tuning."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _is_lora_path(p), params)


def lora_state_dict(params) -> Dict:
    """Adapter-only sub-tree (for lora.pth-style checkpoints)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict = {}
    for path, leaf in flat:
        if _is_lora_path(path):
            node = out
            keys = [str(getattr(k, "key", k)) for k in path]
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = leaf
    return out


def merge_lora_state_dict(params, lora_params) -> Any:
    """Overlay an adapter-only tree onto a full param tree (lenient load,
    reference vampnet/interface.py:45 strict=False)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    over = tu.flatten_dict(lora_params)
    for k, v in over.items():
        if k in flat:
            flat[k] = v.astype(flat[k].dtype) if hasattr(v, "astype") else v
    return tu.unflatten_dict(flat)
