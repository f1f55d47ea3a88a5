"""Round-4 probe: (d,t)-major attention forward layout (VERDICT r3 item 5).

The inference q/k/v/o carried as (bh, t, d) pad d=64 -> 128 lanes in VMEM
tiles (2x HBM waste per tensor). A (bh, d, t) layout puts t on lanes (no
padding: 64 sublanes x t lanes) and contracts the score matmul over
sublanes. docs/PERF.md's core anatomy predicted this "only cuts HBM, not
MXU time"; this probe measures it:

  td    the production whole-seq kernel shape: q(t,d) @ k(t,d)^T
  dt    (d,t)-major kernel: s = q_dt^T(contract d) k_dt, o = v_dt @ p^T
  xpose the (b,h,t,d) <-> (b,h,d,t) transposes the dt layout would need at
        the XLA boundary (qkv projections naturally produce (t,d))

Decision rule: dt wins only if (td - dt) > xpose per forward; otherwise the
(t,d) layout is formally closed as the floor.

Run: python scratch/bench_dt_major.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("PB", "8"))
T = int(os.environ.get("PT", "864"))
H, DH = 20, 64
TP = ((T + 127) // 128) * 128  # 896 at T=864
BH = B * H
DT = jnp.bfloat16
ITERS_LO, ITERS_HI = 2, 12


def _wall(fn, iters, n=3):
    np.asarray(fn(iters))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(iters))
        best = min(best, time.perf_counter() - t0)
    return best


def _diff_ms(fn):
    lo, hi = _wall(fn, ITERS_LO), _wall(fn, ITERS_HI)
    return (hi - lo) / (ITERS_HI - ITERS_LO) * 1e3


# ---------------- (t,d) production-shaped kernel ----------------


def _kernel_td(q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0]  # (T, d)
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # (T, T)
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
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _call_td(q, k, v, bias):
    # grid (h, b), bias resident per head (the production whole-seq layout)
    grid = (H, B)

    def qkv_idx(i0, i1):
        return (i1 * H + i0, 0, 0)

    def bias_idx(i0, i1):
        return (i0, 0, 0)

    return pl.pallas_call(
        _kernel_td,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, TP), bias_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, TP, DH), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q, k, v, bias)


# ---------------- no-max fwd kernel (clamp-guarded base-2 softmax) -------
# The bwd kernel probe (bench_bwd_probe.py) measured the fwd at 58.9 TF/s
# padded vs the bwd's 114.9 — the fwd is VPU-pass-bound, and the row-max
# reduce is one of its passes. Softmax needs the max only to avoid exp
# overflow; in fp32, exp2 overflows at 128, and an ELEMENTWISE clamp at 80
# (fusable into the bias-add + exp2 chain, no cross-lane reduce) is exact
# whenever every score <= 80 — which production scores (|q.k*scale| + T5
# bias, empirically |s| < 40) always satisfy.


def _kernel_td_nomax(q_ref, k_ref, v_ref, b_ref, o_ref):
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
    p = jnp.exp2(jnp.minimum(scores, 80.0))
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _call_td_nomax(q, k, v, bias):
    grid = (H, B)

    def qkv_idx(i0, i1):
        return (i1 * H + i0, 0, 0)

    def bias_idx(i0, i1):
        return (i0, 0, 0)

    return pl.pallas_call(
        _kernel_td_nomax,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, TP), bias_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TP, DH), qkv_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, TP, DH), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q, k, v, bias)


# ---------------- (d,t)-major kernel ----------------


def _kernel_dt_nomax(q_ref, k_ref, v_ref, b_ref, o_ref):
    """dt layout + clamp-guarded softmax (both wins composed)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = b_ref[0]
    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    p = jnp.exp2(jnp.minimum(scores, 80.0))
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        v, p.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def _call_dt_nomax(q, k, v, bias):
    grid = (H, B)

    def qkv_idx(i0, i1):
        return (i1 * H + i0, 0, 0)

    def bias_idx(i0, i1):
        return (i0, 0, 0)

    return pl.pallas_call(
        _kernel_dt_nomax,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, TP), bias_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, DH, TP), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q, k, v, bias)


def _kernel_dt(q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0]  # (d, T)
    k = k_ref[0]  # (d, T)
    v = v_ref[0]  # (d, T)
    bias = b_ref[0]  # (T, T)
    # s[i, j] = sum_d q[d, i] k[d, j]: contract the SUBLANE axis
    scores = (
        jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)  # (T, 1)
    # o[d, i] = sum_j v[d, j] p[i, j]
    acc = jax.lax.dot_general(
        v, p.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (d, T)
    o_ref[0, :, :] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def _call_dt(q, k, v, bias):
    grid = (H, B)

    def qkv_idx(i0, i1):
        return (i1 * H + i0, 0, 0)

    def bias_idx(i0, i1):
        return (i0, 0, 0)

    return pl.pallas_call(
        _kernel_dt,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, TP), bias_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, DH, TP), qkv_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, DH, TP), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(q, k, v, bias)


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (BH, TP, DH), DT)
    k = jax.random.normal(ks[1], (BH, TP, DH), DT)
    v = jax.random.normal(ks[2], (BH, TP, DH), DT)
    bias = jax.random.normal(ks[3], (H, TP, TP), jnp.float32).astype(DT) * 0.1

    q_dt = jnp.swapaxes(q, 1, 2)
    k_dt = jnp.swapaxes(k, 1, 2)
    v_dt = jnp.swapaxes(v, 1, 2)

    # numerics cross-check (tiny tolerance: same math, different layout)
    o_td = _call_td(q, k, v, bias)
    o_dt = _call_dt(q_dt, k_dt, v_dt, bias)
    err = float(
        jnp.max(jnp.abs(o_td.astype(jnp.float32) - jnp.swapaxes(o_dt, 1, 2)))
    )
    print(f"parity max|td - dt^T| = {err:.4f}")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_td(q, k, v, bias, iters):
        def body(i, q):
            o = _call_td(q, k, v, bias)
            return o + 1e-6  # dependent: o feeds the next q
        return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_dt(q, k, v, bias, iters):
        def body(i, q):
            o = _call_dt(q, k, v, bias)
            return o + 1e-6
        return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_xpose(q, k, v, iters):
        # the layout change the dt kernel would impose at the XLA boundary:
        # 3 input transposes + 1 output transpose per attention
        def body(i, q):
            a, b2, c = (
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
            )
            o = jnp.swapaxes(a + b2 + c, 1, 2)
            return q + o * 1e-30 + 1e-6
        return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    # no-max parity: EXACT equality expected (scores here are far below the
    # clamp, and exp2(s)/sum == exp2(s-m)/sum(exp2(s-m)) only up to fp32
    # rounding — check it is tiny)
    o_nm = _call_td_nomax(q, k, v, bias)
    err_nm = float(jnp.max(jnp.abs(o_td.astype(jnp.float32) - o_nm.astype(jnp.float32))))
    print(f"parity max|td - nomax| = {err_nm:.6f}")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_nomax(q, k, v, bias, iters):
        def body(i, q):
            o = _call_td_nomax(q, k, v, bias)
            return o + 1e-6
        return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    o_dn = _call_dt_nomax(q_dt, k_dt, v_dt, bias)
    err_dn = float(
        jnp.max(jnp.abs(o_td.astype(jnp.float32) - jnp.swapaxes(o_dn, 1, 2).astype(jnp.float32)))
    )
    print(f"parity max|td - dt_nomax^T| = {err_dn:.6f}")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_dtnm(q, k, v, bias, iters):
        def body(i, q):
            o = _call_dt_nomax(q, k, v, bias)
            return o + 1e-6
        return jnp.sum(jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32))

    ms_td = _diff_ms(lambda it: loop_td(q, k, v, bias, it))
    ms_dt = _diff_ms(lambda it: loop_dt(q_dt, k_dt, v_dt, bias, it))
    ms_nm = _diff_ms(lambda it: loop_nomax(q, k, v, bias, it))
    ms_dn = _diff_ms(lambda it: loop_dtnm(q_dt, k_dt, v_dt, bias, it))
    ms_xp = _diff_ms(lambda it: loop_xpose(q, k, v, it))
    print(f"shape b={B} t={T} (tp={TP})")
    print(f"[td kernel]  {ms_td:.3f} ms / forward (20 layers -> x20)")
    print(f"[dt kernel]  {ms_dt:.3f} ms / forward")
    print(f"[nomax td]   {ms_nm:.3f} ms / forward ({(ms_td-ms_nm)/ms_td*100:+.1f}% vs td)")
    print(f"[dt+nomax]   {ms_dn:.3f} ms / forward ({(ms_td-ms_dn)/ms_td*100:+.1f}% vs td)")
    print(f"[transposes] {ms_xp:.3f} ms (4x (bh,t,d)<->(bh,d,t))")
    print(
        f"verdict: dt {'WINS' if ms_dt + ms_xp < ms_td else 'LOSES'} "
        f"net {(ms_dt + ms_xp - ms_td):+.3f} ms vs td per attention call"
    )


if __name__ == "__main__":
    main()
