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

Sequences beyond `MAX_SINGLE_PASS_SEQ` switch to the blocked online-softmax
variant (k/v streamed block-by-block on grid dim 2, running max/denominator
in VMEM scratch) — chunk-free attention for long context at O(t) memory.

VPU economy (the kernels sit near a VPU+MXU-serialized floor, docs/PERF.md):
the softmax runs in base 2 with `scale * log2(e)` folded into q and `log2(e)`
into the bias BEFORE the kernels, deleting the (t, t)-sized `* scale` pass
and exp's internal base conversion from every program; and the forward
normalizes AFTER the p @ v matmul (one (t, d) divide instead of a (t, t)
one). The custom-VJP core therefore differentiates `softmax2(qs k^T + b2) v`
— the chain rule for the q/bias prefolds happens outside in XLA (a cheap
(t, d) multiply), and dk = ds2^T qs needs no scale factor at all.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SINGLE_PASS_SEQ = 1024  # beyond this, the blocked online-softmax kernel

LOG2E = 1.4426950408889634  # log2(e): folded into q/bias for base-2 softmax
LN2 = 0.6931471805599453  # ln(2): d softmax2 / d s2 carries this factor


def _attn_kernel_blocked(
    q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr
):
    """Online-softmax flash attention: grid dim 2 streams k/v blocks; running
    max/denominator/accumulator live in VMEM scratch across grid steps.
    q and bias arrive pre-folded (base-2 softmax, module docstring)."""
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # MXU dots run on the INPUT dtype with f32 accumulation: bf16 inputs are
    # exactly representable, so skipping the f32 upcast changes nothing
    # numerically for q@k^T while avoiding the multi-pass fp32 MXU rate.
    q = q_ref[0]  # (BQ, d)
    k = k_ref[0]  # (BK, d)
    v = v_ref[0]  # (BK, d)
    bias = b_ref[0]  # (BQ, BK)

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(kb == n_kb - 1)
    def _():
        o_ref[0, :, :] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0]  # (BQ, d) — pre-scaled; input dtype; f32 accumulation
    k = k_ref[0]  # (T, d)
    v = v_ref[0]  # (T, d) bf16
    bias = b_ref[0]  # (BQ, T) pre-folded by log2(e)

    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # normalize AFTER the dot: a (BQ, d) divide instead of a (BQ, T) one.
    # (Riding the denominator on a ones-lane of padded v was measured 2.7x
    # WORSE — Mosaic's single-lane extract + cross-lane broadcast costs far
    # more than this row reduce.)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _attn_kernel_dt(q_ref, k_ref, v_ref, b_ref, o_ref):
    """(d,t)-major whole-sequence forward (inference primal only).

    Same math as _attn_kernel, but q/k/v/o ride as (d, t): t on the 128-lane
    axis, TRUE d (64) on sublanes — no d->128 lane padding in VMEM or HBM.
    Round-4 probe (scratch/bench_dt_major.py, b=8/2 t=864 and c2f b=32
    t=259): 1.2-3x faster than the (t, d) kernel with EXACT output parity;
    net of the boundary transposes it wins 0.13-0.28 ms per call. The score
    matmul contracts the SUBLANE axis (64-deep), p@v contracts lanes.
    """
    q = q_ref[0]  # (d, T) pre-scaled
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # (T, T) pre-folded by log2(e)

    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )  # (T, T): rows = query index
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # o[d, i] = sum_j v[d, j] p[i, j]
    acc = jax.lax.dot_general(
        v, p.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, T)
    o_ref[0, :, :] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def _attn_kernel_fwd_lse_dt(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref):
    """(d,t)-major single-pass forward that also emits log2-sumexp2 rows.

    The TRAINING counterpart of _attn_kernel_dt: same layout win (t on the
    128-lane axis, true d=64 on sublanes — no d->128 lane padding), same
    fp32-accumulated matmuls as the (t,d) fwd+lse kernel, so the saved lse
    and output are bitwise-identical and the (t,d) backward kernels consume
    them unchanged. The lse row is the kernel's only cross-layout write
    (a (T,)-sized sublane->lane transpose — noise next to the (T,T) work)."""
    q = q_ref[0]  # (d, T) pre-scaled
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # (T, T) pre-folded by log2(e)

    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )  # (T, T): rows = query index
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0, :] = (m + jnp.log2(l))[:, 0]
    acc = jax.lax.dot_general(
        v, p.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, T)
    o_ref[0, :, :] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def _fwd_call_dt(qp, kp, vp, bias_p, h, d, interpret, with_lse=False):
    """(d,t)-major forward dispatch on the padded (bh, tp, dp) arrays.

    Slices back to the true head dim and transposes to (bh, d, tp) — XLA
    elides the slice-of-pad and the output pad-of-slice, so the d->128
    padding the (t,d) path materializes in HBM never exists in the
    inference program. Grid (h, batch): the shared T5 bias block stays
    VMEM-resident across the inner batch sweep."""
    bh, tp, dp = qp.shape
    b = bh // h

    def to_dt(x):
        return jnp.swapaxes(x[:, :, :d], 1, 2)

    def qkv_idx(i0, i1):
        return (i1 * h + i0, 0, 0)

    def bias_idx(i0, i1):
        return (i0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, d, tp), qkv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, tp), qkv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, tp), qkv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, tp), bias_idx, memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, d, tp), qkv_idx, memory_space=pltpu.VMEM)
    if with_lse:
        out, lse = pl.pallas_call(
            _attn_kernel_fwd_lse_dt,
            grid_spec=pl.GridSpec(
                grid=(h, b),
                in_specs=in_specs,
                out_specs=(
                    o_spec,
                    pl.BlockSpec(
                        (1, 1, tp),
                        lambda i0, i1: (i1 * h + i0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, d, tp), qp.dtype),
                jax.ShapeDtypeStruct((bh, 1, tp), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(to_dt(qp), to_dt(kp), to_dt(vp), bias_p)
    else:
        out = pl.pallas_call(
            _attn_kernel_dt,
            grid_spec=pl.GridSpec(
                grid=(h, b),
                in_specs=in_specs,
                out_specs=o_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((bh, d, tp), qp.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(to_dt(qp), to_dt(kp), to_dt(vp), bias_p)
        lse = None
    out = jnp.swapaxes(out, 1, 2)  # (bh, tp, d)
    # pad d back to dp: custom_vjp requires primal/fwd output avals to match;
    # the caller immediately slices [:, :t, :d], so XLA removes this pad
    out = jnp.pad(out, ((0, 0), (0, 0), (0, dp - d)))
    return (out, lse) if with_lse else out


def _attn_kernel_fwd_lse(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref):
    """Single-pass forward that also emits log2-sumexp2 rows (for the VJP)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]

    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0, :] = (m + jnp.log2(l))[:, 0]
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _attn_kernel_bwd(
    q_ref, k_ref, v_ref, b_ref, lse_ref, do_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
):
    """Backward for the single-pass kernel. Grid (bh, q_blocks); dk/dv
    accumulate across q_blocks (same out block revisited sequentially)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0])
        dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0])

    # All five MXU dots run on the INPUT dtype (f32 accumulation): for the
    # recomputed scores and do@v this is numerically identical to the old
    # f32 upcast (bf16 inputs are exact), and p/ds are truncated to the
    # input dtype for their dots — the same convention the forward uses for
    # p@v, and what bf16 training pays everywhere else. fp32 inputs are
    # unchanged (every cast is a no-op), so grad-parity tests still bind.
    q = q_ref[0]  # (BQ, d) — pre-scaled qs
    k = k_ref[0]  # (T, d)
    v = v_ref[0]  # (T, d)
    bias = b_ref[0]  # (BQ, T) — pre-folded b2
    lse = lse_ref[0, 0, :][:, None]  # (BQ, 1), base-2
    do = do_ref[0]  # (BQ, d)
    delta = delta_ref[0, 0, :][:, None]  # (BQ, 1) = rowsum(do * out)

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    p = jnp.exp2(s - lse)  # softmax probs (BQ, T)
    # dv += p^T do
    dv_ref[0, :, :] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, T)
    ds = p * (dp - delta) * LN2  # dL/d(qs k^T + b2), base-2 chain factor
    dbias_ref[0, :, :] = ds.astype(dbias_ref.dtype)
    ds_mm = ds.astype(q.dtype)
    dq_ref[0, :, :] = jax.lax.dot_general(
        ds_mm, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0, :, :] += jax.lax.dot_general(
        ds_mm, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _attn_kernel_bwd_dkdv(
    q_ref, k_ref, v_ref, b_ref, lse_ref, do_ref, delta_ref,
    dk_ref, dv_ref,
):
    """dk/dv half of the split backward (shared-bias path). Grid
    (bh, q_blocks): dk/dv accumulate across q_blocks in the revisited
    output block, exactly like the combined kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0])
        dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]
    lse = lse_ref[0, 0, :][:, None]
    do = do_ref[0]
    delta = delta_ref[0, 0, :][:, None]

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    p = jnp.exp2(s - lse)
    dv_ref[0, :, :] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * LN2).astype(q.dtype)
    dk_ref[0, :, :] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _attn_kernel_bwd_dq_dbias(
    q_ref, k_ref, v_ref, b_ref, lse_ref, do_ref, delta_ref,
    dq_ref, dbias_ref, *, block_q: int,
):
    """dq/dbias half of the split backward (shared-bias path). Grid
    (h, batch, q_blocks): the (1, t, t) dbias output block for head i0 is
    revisited across ALL inner (batch, q_block) steps, so the batch
    reduction of the bias gradient happens IN VMEM — the combined kernel
    instead wrote the per-(batch*head) ds tensor to HBM (513 MB fp32 per
    layer at b=8 t=861) and re-read it for an XLA batch-sum. k/v blocks
    depend only on (i0, i1) and stay resident across the q-block loop."""
    i1 = pl.program_id(1)  # batch index
    i2 = pl.program_id(2)  # q block index

    @pl.when(jnp.logical_and(i1 == 0, i2 == 0))
    def _():
        dbias_ref[0, :, :] = jnp.zeros_like(dbias_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # (block_q, t)
    lse = lse_ref[0, 0, :][:, None]
    do = do_ref[0]
    delta = delta_ref[0, 0, :][:, None]

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * LN2  # dL/d(qs k^T + b2)
    dbias_ref[0, pl.dslice(i2 * block_q, block_q), :] += ds
    dq_ref[0, :, :] = jax.lax.dot_general(
        ds.astype(q.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)


def _attn_kernel_bwd_wholeseq(
    q_ref, k_ref, v_ref, b_ref, lse_ref, do_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
):
    """Whole-sequence shared-bias backward in ONE pass. Grid (h, batch):
    every program holds the full (t, t) score block, so dq, dk, dv AND the
    batch-reduced dbias all come out of a single recompute of s/p — the
    split pair (_attn_kernel_bwd_dkdv + _attn_kernel_bwd_dq_dbias) computes
    s and dp twice (7 score-sized matmuls vs this kernel's 5). dbias for
    head i0 stays resident in VMEM across the inner batch sweep."""
    i1 = pl.program_id(1)  # batch index (inner loop)

    @pl.when(i1 == 0)
    def _():
        dbias_ref[0, :, :] = jnp.zeros_like(dbias_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # (t, t)
    lse = lse_ref[0, 0, :][:, None]
    do = do_ref[0]
    delta = delta_ref[0, 0, :][:, None]

    s = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    p = jnp.exp2(s - lse)
    dv_ref[0, :, :] = jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * LN2  # dL/d(qs k^T + b2)
    dbias_ref[0, :, :] += ds
    ds_mm = ds.astype(q.dtype)
    dq_ref[0, :, :] = jax.lax.dot_general(
        ds_mm, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0, :, :] = jax.lax.dot_general(
        ds_mm, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_call(qp, kp, vp, bias_p, block_q, h, interpret, with_lse):
    """Single-pass forward pallas_call on padded (bh, tp, dp) arrays.

    Shared-bias grid order is (h, q_block, batch) — batch innermost — so the
    head's fp32 (block_q, tp) bias block stays VMEM-resident across the
    batch sweep instead of being re-fetched per (batch, head) program (at
    train shapes that re-fetch was ~513 MB/layer of pure bias reads; q/k/v
    blocks are per-program fetches either way at the whole-seq default)."""
    bh, tp, dp = qp.shape
    shared_bias = bias_p.shape[0] != bh
    if shared_bias:
        grid = (h, tp // block_q, bh // h)
        qo_index = lambda i0, i1, i2: (i2 * h + i0, i1, 0)
        kv_index = lambda i0, i1, i2: (i2 * h + i0, 0, 0)
        bias_index = lambda i0, i1, i2: (i0, i1, 0)
        lse_index = lambda i0, i1, i2: (i2 * h + i0, 0, i1)
    else:
        grid = (bh, tp // block_q)
        qo_index = lambda i, j: (i, j, 0)
        kv_index = lambda i, j: (i, 0, 0)
        bias_index = lambda i, j: (i, j, 0)
        lse_index = lambda i, j: (i, 0, j)
    in_specs = [
        pl.BlockSpec((1, block_q, dp), qo_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, dp), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, dp), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, tp), bias_index, memory_space=pltpu.VMEM),
    ]
    if with_lse:
        return pl.pallas_call(
            _attn_kernel_fwd_lse,
            out_shape=(
                jax.ShapeDtypeStruct((bh, tp, dp), qp.dtype),
                jax.ShapeDtypeStruct((bh, 1, tp), jnp.float32),
            ),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((1, block_q, dp), qo_index,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, block_q), lse_index,
                                 memory_space=pltpu.VMEM),
                ),
            ),
            interpret=interpret,
        )(qp, kp, vp, bias_p)
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, tp, dp), qp.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, block_q, dp), qo_index, memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attention_core(qp, kp, vp, bias_p, block_q, h, d, interpret):
    """Differentiable single-pass fused attention on padded PRE-FOLDED arrays
    (base-2 softmax: qp carries scale*log2e, bias_p carries log2e).

    This primal body runs only OUTSIDE differentiation (jax.custom_vjp
    semantics), i.e. on the inference path: whole-seq shared-bias calls take
    the (d,t)-major kernel (_attn_kernel_dt — 1.2-3x at serving shapes, see
    its docstring). Under jax.grad the VJP forward takes the matching
    (d,t) fwd+lse kernel (same fp32-accumulated matmuls, identical out/lse);
    the backward keeps the (t,d) kernels, which want their residuals in
    (t,d) anyway (the residuals ARE the padded inputs).

    Backward is its own Pallas kernel (custom-VJP pattern): probabilities are
    recomputed per q-block from the saved log2-sumexp2, dk/dv accumulate
    across q-blocks in the revisited output block, dbias is emitted per
    (bh, q, k) and reduced over the batch outside when the bias is
    head-shared. The prefolds' own chain rule runs outside in XLA.
    """
    bh, tp, _dp = qp.shape
    whole_seq_shared_bias = block_q == tp and bias_p.shape[0] == h
    if whole_seq_shared_bias:
        return _fwd_call_dt(qp, kp, vp, bias_p, h, d, interpret)
    return _fwd_call(qp, kp, vp, bias_p, block_q, h, interpret, with_lse=False)


# Round-5: the (d,t) TRAINING forward is opt-in, default OFF. The per-layer
# VJP probe favored it (1.92 -> 1.84 ms) but two same-process td/dt/td step
# sandwiches on different days both read dt ~1% SLOWER at full-step level
# (337.4/337.6 vs 341.1 ms and 337.6 vs 340.9/341.1 — docs/PERF.md
# "Round-5"), so the step graph pays more at the layout boundary than the
# kernel saves. Inference keeps (d,t) unconditionally (clear measured win).
_DT_TRAIN_FWD = os.environ.get("VAMPNET_DT_TRAIN_FWD", "0") == "1"


def _attention_core_fwd(qp, kp, vp, bias_p, block_q, h, d, interpret):
    bh, tp, _dp = qp.shape
    if _DT_TRAIN_FWD and block_q == tp and bias_p.shape[0] == h:
        # opt-in (d,t)-major training forward: bitwise-identical out/lse,
        # residuals stay the (t,d) padded inputs the backward consumes
        out, lse = _fwd_call_dt(
            qp, kp, vp, bias_p, h, d, interpret, with_lse=True
        )
    else:
        out, lse = _fwd_call(
            qp, kp, vp, bias_p, block_q, h, interpret, with_lse=True
        )
    return out, (qp, kp, vp, bias_p, out, lse)


def _attention_core_bwd(block_q, h, d, interpret, res, do):
    qp, kp, vp, bias_p, out, lse = res
    bh, tp, dp = qp.shape
    shared_bias = bias_p.shape[0] != bh
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # (bh, 1, tp)

    if shared_bias:
        return _attention_core_bwd_split(
            qp, kp, vp, bias_p, lse, do, delta, block_q, h, interpret
        )

    bias_index = lambda i, j: (i, j, 0)
    grid = (bh, tp // block_q)
    dq, dk, dv, dbias = pl.pallas_call(
        _attn_kernel_bwd,
        out_shape=(
            jax.ShapeDtypeStruct((bh, tp, dp), qp.dtype),
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, tp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, tp), bias_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, tp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, lse, do, delta)

    dk = dk.astype(kp.dtype)
    dv = dv.astype(vp.dtype)
    dbias = dbias.astype(bias_p.dtype)
    return dq, dk, dv, dbias


# scoped-VMEM budget for the whole-seq split-backward programs: the raised
# 64 MB CompilerParams limit minus slop for whatever the fusion context adds
# (CLAUDE.md: Mosaic scoped-VMEM pressure is fusion-context-dependent)
_BWD_WHOLESEQ_VMEM_BUDGET = 48 * 1024 * 1024
# batch-scaled staging headroom: whole-seq programs stage fp32 score-sized
# buffers per (batch, head); calibrated to the measured points — b=8 x 20
# heads x tp=896 (514 MB) trains, b=16 (1.03 GB) OOMs HBM at coarse scale
_BWD_WHOLESEQ_HBM_BUDGET = 768 * 1024 * 1024


def _split_bwd_vmem_bytes(block_q: int, tp: int, dp: int, in_bytes: int) -> int:
    """Per-program VMEM residency estimate for the split backward kernels
    (the dq/dbias kernel dominates: its block set plus the fp32
    (block_q, tp) temps the body materializes — s, p, dp, ds). I/O blocks
    are counted twice for Mosaic's double buffering."""
    blocks = (
        3 * block_q * dp * in_bytes  # q, do, dq
        + 2 * tp * dp * in_bytes  # k, v
        + block_q * tp * 4  # bias block
        + 2 * block_q * 4  # lse, delta
        + 2 * tp * dp * 4  # dk/dv accumulators
        + tp * tp * 4  # dbias output block
    )
    temps = 4 * block_q * tp * 4
    return 2 * blocks + temps


def _split_bwd_block_q(block_q: int, bh: int, tp: int, dp: int, in_bytes: int) -> int:
    """Resolve the backward q-block size: whole-sequence blocks are the fast
    path (train step 207 -> 177.6 ms at b=8, docs/PERF.md) but must fit the
    scoped-VMEM budget AND the chip's HBM staging headroom at the given
    batch*heads; otherwise fall back to the measured-working 128-row blocks."""
    if block_q < tp:
        return block_q
    if _split_bwd_vmem_bytes(block_q, tp, dp, in_bytes) > _BWD_WHOLESEQ_VMEM_BUDGET:
        return 128
    if bh * tp * tp * 4 > _BWD_WHOLESEQ_HBM_BUDGET:
        return 128
    return block_q


def _bwd_wholeseq_call(qp, kp, vp, bias_p, lse, do, delta, h, interpret):
    """pallas_call wrapper for _attn_kernel_bwd_wholeseq: grid (h, batch),
    dq/dk/dv per (batch, head) program, dbias batch-reduced in VMEM."""
    bh, tp, dp = qp.shape
    b = bh // h
    bh_spec = pl.BlockSpec(
        (1, tp, dp), lambda i0, i1: (i1 * h + i0, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, 1, tp), lambda i0, i1: (i1 * h + i0, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv, dbias = pl.pallas_call(
        _attn_kernel_bwd_wholeseq,
        out_shape=(
            # dk/dv leave the kernel in the INPUT dtype: each (batch, head)
            # program writes its slice exactly once (no cross-program
            # accumulation), and the caller cast them down anyway — writing
            # fp32 first just doubled their HBM write traffic
            jax.ShapeDtypeStruct((bh, tp, dp), qp.dtype),
            jax.ShapeDtypeStruct((bh, tp, dp), kp.dtype),
            jax.ShapeDtypeStruct((bh, tp, dp), vp.dtype),
            jax.ShapeDtypeStruct((h, tp, tp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(h, b),
            in_specs=[
                bh_spec,  # q
                bh_spec,  # k
                bh_spec,  # v
                pl.BlockSpec((1, tp, tp), lambda i0, i1: (i0, 0, 0),
                             memory_space=pltpu.VMEM),  # shared bias
                row_spec,  # lse
                bh_spec,  # do
                row_spec,  # delta
            ],
            out_specs=(
                bh_spec,  # dq
                bh_spec,  # dk
                bh_spec,  # dv
                pl.BlockSpec((1, tp, tp), lambda i0, i1: (i0, 0, 0),
                             memory_space=pltpu.VMEM),  # dbias (batch-resident)
            ),
        ),
        # (t, t) bias + dbias + score temps put the resident set past the
        # 16 MB default scoped limit; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, bias_p, lse, do, delta)
    return dq, dk, dv, dbias.astype(bias_p.dtype)


def _attention_core_bwd_split(
    qp, kp, vp, bias_p, lse, do, delta, block_q, h, interpret
):
    """Shared-bias backward as two kernels: (dk, dv) with q-blocks innermost
    per row, and (dq, dbias) with the batch loop inside so the bias gradient
    reduces over the batch in VMEM (one (h, t, t) write instead of a
    (b*h, t, t) write + XLA reduce)."""
    bh, tp, dp = qp.shape
    b = bh // h
    block_q = _split_bwd_block_q(block_q, bh, tp, dp, qp.dtype.itemsize)
    if block_q >= tp:
        # whole-seq: one single-pass kernel (5 score-sized matmuls) instead
        # of the dkdv + dq/dbias pair (7) — measured on the b=8 train step
        return _bwd_wholeseq_call(
            qp, kp, vp, bias_p, lse, do, delta, h, interpret
        )
    n_qb = tp // block_q

    dk, dv = pl.pallas_call(
        _attn_kernel_bwd_dkdv,
        out_shape=(
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tp, dp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(bh, n_qb),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, tp), lambda i, j: (i % h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        # same raised scoped-VMEM limit as the dq/dbias kernel below: this
        # kernel's whole-seq resident set ((t, t) temps + streamed k/v) can
        # also cross Mosaic's conservative 16 MB default depending on the
        # fusion context (remat, batch), far below the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, bias_p, lse, do, delta)

    dq, dbias = pl.pallas_call(
        functools.partial(_attn_kernel_bwd_dq_dbias, block_q=block_q),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tp, dp), qp.dtype),
            jax.ShapeDtypeStruct((h, tp, tp), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(h, b, n_qb),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i0, i1, i2: (i1 * h + i0, i2, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i0, i1, i2: (i1 * h + i0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, dp), lambda i0, i1, i2: (i1 * h + i0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, tp), lambda i0, i1, i2: (i0, i2, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i0, i1, i2: (i1 * h + i0, 0, i2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, dp), lambda i0, i1, i2: (i1 * h + i0, i2, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda i0, i1, i2: (i1 * h + i0, 0, i2),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, dp), lambda i0, i1, i2: (i1 * h + i0, i2, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tp, tp), lambda i0, i1, i2: (i0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        # whole-seq blocks put this kernel's resident set (bias + dbias +
        # (t, t) temps) at ~18 MB — over Mosaic's conservative 16 MB default
        # scoped-VMEM limit in some fusion contexts (remat), though far under
        # the chip's 128 MB VMEM. Raise the limit rather than shrink the
        # blocks (448-row blocks measured 14 ms/step slower).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, bias_p, lse, do, delta)

    return dq, dk.astype(kp.dtype), dv.astype(vp.dtype), dbias.astype(bias_p.dtype)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def flash_attention_with_bias(
    q: jnp.ndarray,  # (b, t, h, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # (h, t, t) additive, fp32
    mask: Optional[jnp.ndarray] = None,  # (b, t, t); 0 = blocked
    block_q: Optional[int] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    blocked = t > MAX_SINGLE_PASS_SEQ
    # base-2 softmax prefolds (module docstring): scale*log2e rides in q —
    # a (t, d) multiply per layer instead of a (t, t) one per kernel — and
    # log2e rides in the bias, CSE'd once per forward across layers. The
    # multiply runs in fp32 so the folded constant isn't itself rounded to
    # bf16 (which would systematically re-temperature the scores by ~1e-3).
    q = (q.astype(jnp.float32) * (LOG2E / (d ** 0.5))).astype(q.dtype)

    # pad: t to lcm(block-aligned, 128 lanes), d to 128 lanes
    tp = _round_up(t, 128)
    if block_q is None:
        # whole-sequence q blocks when they fit VMEM (tp <= 896, no per-row
        # mask): the bwd kernels then run one big (t, t) score matmul per
        # program instead of seven 128-row ones — measured 207 -> 178 ms on
        # the full train step at t=861 with identical key padding. The
        # masked path's combined bwd kernel holds bias + dbias + (t, t)
        # temps at once, and tp=1024 overflows VMEM, so those keep 128.
        # The blocked (online-softmax) path prefers 512-row q blocks:
        # 1.8x over 128 at t=2048 (bigger MXU tiles; k/v stream per block_k).
        if blocked:
            block_q = 512
        else:
            block_q = tp if (tp <= 896 and mask is None) else 128
    block_q = min(block_q, tp)
    tp = _round_up(tp, block_q)
    if blocked:
        block_k = min(block_k, tp)
        tp = _round_up(tp, block_k)
    dp = _round_up(d, 128)

    def pad_qkv(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, dp - d)))

    qp, kp, vp = pad_qkv(q), pad_qkv(k), pad_qkv(v)

    if bias is None:
        bias_p = jnp.zeros((h, tp, tp), jnp.float32)
    else:
        # a bf16 bias rides through at bf16 (inference hoists the T5 bias
        # once and re-reads it every layer x step — half the HBM traffic);
        # anything else is upcast to fp32 (training keeps fp32 dbias)
        bias_dt = jnp.bfloat16 if bias.dtype == jnp.bfloat16 else jnp.float32
        bias_p = jnp.pad(
            (bias.astype(jnp.float32) * LOG2E).astype(bias_dt),
            ((0, 0), (0, tp - t), (0, tp - t)),
        )
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
        per_row_bias = True
    else:
        per_row_bias = False

    if blocked:
        bias_index = (
            (lambda i, j, kb: (i, j, kb)) if per_row_bias
            else (lambda i, j, kb: (i % h, j, kb))
        )
        grid = (b * h, tp // block_q, tp // block_k)
        out = pl.pallas_call(
            _attn_kernel_blocked,
            out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, block_q, dp), lambda i, j, kb: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, block_k, dp), lambda i, j, kb: (i, kb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, block_q, block_k), bias_index,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, block_q, dp), lambda i, j, kb: (i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, dp), jnp.float32),
                ],
            ),
            interpret=interpret,
        )(qp, kp, vp, bias_p)
    else:
        # differentiable custom-VJP core (fwd + bwd are both Pallas kernels)
        out = _attention_core(qp, kp, vp, bias_p, block_q, h, d, interpret)

    out = out[:, :t, :d].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
