"""Pallas TPU fused attention with additive relative-position bias.

The reference's attention materializes (b, h, t, t) score matrices in HBM
(vampnet/modules/transformer.py:234-253), and its optional flash_attn CUDA
path (:281-288) cannot take the T5 bias at all. This kernel computes
softmax(q k^T / sqrt(d) + bias) v entirely in VMEM:

  * grid = (batch*heads, q_blocks); each program holds one q block plus the
    FULL k/v for its (batch, head) row in VMEM. At VampNet shapes
    (t <= 1024, d_head 64) k+v+scores+bias is ~2.5 MB — far under the
    ~16 MB VMEM budget — so no online-softmax k-loop is needed and the
    (t, t) score matrix never touches HBM.
  * the bias block is indexed by head (i % n_heads), shared across the batch
    — the T5 relative bias is per-head, not per-row.
  * bf16 inputs, fp32 accumulation on the MXU, fp32 softmax.

Sequences longer than `MAX_VMEM_SEQ` fall back to the XLA path (the chunked
windowed-generation design keeps VampNet sequences at ~862 tokens).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_VMEM_SEQ = 4096  # beyond this, fall back to XLA attention


def _attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, d)
    k = k_ref[0].astype(jnp.float32)  # (T, d)
    v = v_ref[0]  # (T, d) bf16
    bias = b_ref[0]  # (BQ, T) fp32

    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
        + bias
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0, :, :] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_with_bias(
    q: jnp.ndarray,  # (b, t, h, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # (h, t, t) additive, fp32
    mask: Optional[jnp.ndarray] = None,  # (b, t, t); 0 = blocked
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    if t > MAX_VMEM_SEQ:
        from .attention import dot_product_attention

        return dot_product_attention(q, k, v, bias=bias, mask=mask, impl="xla")

    scale = 1.0 / (d ** 0.5)

    # pad: t to lcm(block_q-aligned, 128 lanes), d to 128 lanes
    tp = _round_up(t, 128)
    block_q = min(block_q, tp)
    tp = _round_up(tp, block_q)
    dp = _round_up(d, 128)

    def pad_qkv(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, dp - d)))

    qp, kp, vp = pad_qkv(q), pad_qkv(k), pad_qkv(v)

    if bias is None:
        bias_p = jnp.zeros((h, tp, tp), jnp.float32)
    else:
        bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, tp - t), (0, tp - t)))
    # block padded keys for all queries
    if tp > t:
        key_pad = (jnp.arange(tp) >= t)[None, None, :]
        bias_p = jnp.where(key_pad, -1e9, bias_p)
    if mask is not None:
        if mask.ndim == 4:
            mask = mask[:, 0]
        mp = jnp.pad(mask.astype(bool), ((0, 0), (0, tp - t), (0, tp - t)))
        # fold the (b, t, t) mask into a per-(b,h) bias by expanding bias over b
        bias_p = jnp.where(
            mp[:, None], jnp.broadcast_to(bias_p[None], (b, h, tp, tp)), -1e9
        ).reshape(b * h, tp, tp)
        bias_index = lambda i, j: (i, j, 0)
        bias_block = (1, block_q, tp)
    else:
        bias_index = lambda i, j: (i % h, j, 0)
        bias_block = (1, block_q, tp)

    grid = (b * h, tp // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p)

    out = out[:, :t, :d].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
