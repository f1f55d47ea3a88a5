"""Attention primitives with additive relative-position bias.

The reference relies on einsum attention (vampnet/modules/transformer.py:234-253)
or the optional flash_attn CUDA extension (:281-288). Here the default is an
XLA-fused softmax attention in bf16 with fp32 accumulation; `impl="pallas"`
selects the Pallas TPU flash-attention kernel with bias support
(vampnet_tpu/ops/flash_attention.py) when the sequence is long enough to
benefit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # (b, t_q, h, d)
    k: jnp.ndarray,  # (b, t_k, h, d)
    v: jnp.ndarray,  # (b, t_k, h, d)
    bias: Optional[jnp.ndarray] = None,  # (h, t_q, t_k) additive
    mask: Optional[jnp.ndarray] = None,  # (b, t_q, t_k) or (b, 1, t_q, t_k); 0 = blocked
    impl: str = "xla",
) -> jnp.ndarray:
    if impl == "auto":
        from .flash_attention import MAX_SINGLE_PASS_SEQ

        # the single-pass kernel has a custom VJP (trainable); the blocked
        # long-sequence variant does not, so long sequences use XLA on auto
        use_pallas = (
            jax.default_backend() == "tpu" and q.shape[1] <= MAX_SINGLE_PASS_SEQ
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention_with_bias

        return flash_attention_with_bias(q, k, v, bias=bias, mask=mask)

    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias[None].astype(jnp.float32)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        scores = jnp.where(mask == 0, -1e9, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)
