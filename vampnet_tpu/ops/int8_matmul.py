"""Fused w8a8 matmul Pallas kernel.

Round-1 finding (docs/PERF.md #1): the int8 path through XLA dot_general
measured ~flat vs bf16 because dynamic activation quantization ran as
separate XLA ops — absmax, scale, round, clip each made a full HBM pass over
the activations before the int8 matmul ever saw them. This kernel fuses the
whole w8a8 pipeline in VMEM:

    per-row absmax -> activation quant (int8) -> int8 x int8 MXU matmul with
    int32 accumulation -> dequant by (row_scale x per-out-channel w_scale)

so activations are read from HBM exactly once and the intermediate int8/int32
tensors never leave VMEM. int32 accumulation is exact (k <= 2560 here:
|sum| < 2^31), so pallas and XLA reference paths agree bit-for-bit through
the integer part.

Replaces what the reference gets from cuDNN fp16 (reference
vampnet/modules/transformer.py:281-288 flash_attn + torch autocast); the
weight-side layout comes from modules/quantize.quantize_lm_params.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# K is kept whole in VMEM (the LM's largest contraction is w_2's 2560);
# per-row absmax then needs no cross-block reduction.
MAX_FUSED_K = 4096


def _kernel(x_ref, wq_ref, ws_ref, out_ref, *, out_dtype):
    a = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (acc.astype(jnp.float32) * a_scale * ws_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "interpret", "impl")
)
def w8a8_matmul(
    x: jnp.ndarray,          # (..., k) float
    w_q: jnp.ndarray,        # (k, n) int8
    w_scale: jnp.ndarray,    # (n,) f32 per-out-channel
    out_dtype: Any = jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
    impl: str = "auto",      # auto | pallas | xla
) -> jnp.ndarray:
    """y = dequant(quant_rowwise(x) @ w_q). Fused on TPU; XLA fallback keeps
    identical numerics (same round/clip, exact int32 accumulation)."""
    k, n = w_q.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if impl == "auto":
        # measured on v5e (scratch/bench_int8.py): the fused kernel wins only
        # at small m, where the XLA path's separate quant dispatches dominate;
        # at serving batch shapes (m ~ 7k) XLA fuses the row-quant into the
        # int8 matmul and beats both the fused kernel (which re-streams the
        # weight per row block) and bf16 (w_1: 0.284 vs 0.481 ms at m=6912)
        impl = (
            "pallas"
            if (jax.default_backend() == "tpu" or interpret)
            and k <= MAX_FUSED_K and m <= 2048
            else "xla"
        )

    if impl == "xla":
        a = x2.astype(jnp.float32)
        amax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
        a_scale = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * a_scale * w_scale[None, :]).astype(out_dtype)
        return y.reshape(lead + (n,))

    bm = min(block_m, m)
    bn = min(block_n, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    y = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, w_q, w_scale.reshape(1, n).astype(jnp.float32))
    return y.reshape(lead + (n,))
