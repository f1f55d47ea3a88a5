"""Fused GEGLU feed-forward Pallas kernel (docs/PERF.md backlog #2).

One transformer FFN at coarse shapes (m=1728, d=1280) moves ~50 MB of
intermediates through HBM on the XLA path: RMSNorm reads and rewrites x,
w_1 writes the (m, 4d) hidden tensor (17.7 MB bf16), the GEGLU
split/gelu/multiply reads it back and writes (m, 2d), and w_2 reads that
again. This kernel keeps the whole chain in VMEM per (row-block,
hidden-block): x is read once, the residual-added output written once, and
the hidden activations never exist in HBM:

    out = x + (p1 * gelu(p2)) @ w2,   [p1 | p2] = rmsnorm(x; nw) @ [w1a | w1b]

Grid (m_blocks, f_blocks), f fastest: the norm is computed once per row
block (at f==0) into VMEM scratch, w1/w2 column/row blocks stream per f
step, and an fp32 accumulator carries the w_2 partial sums until the last
f block writes the residual-added output.

MEASURED NET NEGATIVE at VampNet serving shapes (15.0 vs 14.1 ms/forward,
scratch/bench_forward.py): weights are re-fetched once per row block —
19.6 MB x 7 blocks/layer at m=1728 — which costs more HBM time than the
~50 MB/layer of eliminated intermediates, and VMEM (~16 MB) cannot hold
row blocks big enough to flip the ratio. The kernel is therefore an
OPT-IN (`ffn_impl="fused"`), kept for small-m regimes (m <~ 512, where a
single row block streams the weights exactly once and strictly beats the
unfused path) and as a documented negative result (docs/PERF.md).

Numerics: the hidden products accumulate in fp32 on the MXU (the XLA path
rounds them to bf16 between every op), so fused logits differ from the XLA
path at bf16 resolution — parity tests use bf16-level tolerances.

Reference counterpart: vampnet/modules/transformer.py:61-85 (FeedForward);
the reference leaves this chain to eager torch + cuDNN.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, nw_ref, w1a_ref, w1b_ref, w2_ref, o_ref, y_scr, acc_scr,
                *, eps: float):
    j = pl.program_id(1)
    n_f = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[...].astype(jnp.float32)  # (BM, D)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps) * nw_ref[0][None, :]
        y_scr[...] = y.astype(y_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    y = y_scr[...]
    h1 = jax.lax.dot(y, w1a_ref[...], preferred_element_type=jnp.float32)
    h2 = jax.lax.dot(y, w1b_ref[...], preferred_element_type=jnp.float32)
    g = (h1 * jax.nn.gelu(h2, approximate=True)).astype(y.dtype)
    acc_scr[...] += jax.lax.dot(g, w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == n_f - 1)
    def _():
        o_ref[...] = (
            x_ref[...].astype(jnp.float32) + acc_scr[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_m", "block_f", "interpret")
)
def fused_geglu_ffn(
    x: jnp.ndarray,  # (b, t, d) bf16/f32
    norm_weight: jnp.ndarray,  # (d,) fp32 — RMSNorm scale
    w1: jnp.ndarray,  # (d, 4d) — GEGLU up-projection [value | gate]
    w2: jnp.ndarray,  # (2d, d) — down-projection
    eps: float = 1e-6,
    block_m: int = 256,
    block_f: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + FeedForward(RMSNorm(x)) in one kernel (bias-free GEGLU, the
    VampNet layer shape). Split convention matches jnp.split(h, 2, -1):
    w1's first half produces the value path p1, second half the gate p2."""
    b, t, d = x.shape
    d_ff = w1.shape[1]
    half = d_ff // 2
    assert w1.shape == (d, d_ff) and w2.shape == (half, d)
    if not interpret:
        assert d % 128 == 0, f"model dim {d} must be lane-aligned"

    m = b * t
    xm = x.reshape(m, d)
    if interpret:
        bm = min(block_m, m)
        bf = min(block_f, half)
    else:
        bm = min(block_m, max(8, (m // 8) * 8 if m < block_m else block_m))
        bf = half if half <= block_f else max(128, (block_f // 128) * 128)
    mp = pl.cdiv(m, bm) * bm
    if mp > m:
        # zero rows norm to zero, produce zero FFN output, and are sliced off
        xm = jnp.pad(xm, ((0, mp - m), (0, 0)))
    fp = pl.cdiv(half, bf) * bf
    w1a = w1[:, :half].astype(x.dtype)
    w1b = w1[:, half:].astype(x.dtype)
    w2c = w2.astype(x.dtype)
    if fp > half:
        w1a = jnp.pad(w1a, ((0, 0), (0, fp - half)))
        w1b = jnp.pad(w1b, ((0, 0), (0, fp - half)))
        w2c = jnp.pad(w2c, ((0, fp - half), (0, 0)))

    grid = (mp // bm, fp // bf)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((mp, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, bf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((bm, d), x.dtype),
                pltpu.VMEM((bm, d), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(
        xm,
        norm_weight.astype(jnp.float32).reshape(1, d),
        w1a,
        w1b,
        w2c,
    )
    return out[:m].reshape(b, t, d)
