"""Fused token-sampling Pallas kernel (docs/PERF.md backlog #3).

One MaskGIT step samples from (b, t*C, V) logits — ~28 MB fp32 at coarse
shapes. The XLA path (sampling/sample.py) makes many HBM passes over that
tensor: log_softmax, entropy, 24 bisection iterations for the typical
filter, optional top-p bisection, temperature softmax, categorical draw,
prob gather. This kernel does ALL of it in VMEM per (row, position-block):
logits are read from HBM exactly once and only the (b, t*C) tokens and
selected probabilities are written back.

Randomness comes from the TPU-core PRNG (pltpu.prng_random_bits) seeded
with (row_key, step, position-block), so:
  * fixed seed -> identical tokens across runs (its own determinism
    contract — the bit stream differs from jax.random's threefry, so the
    fused sampler is an opt-in `sampler_impl`, not a silent swap);
  * a row's draws depend only on its own key — solo == batched holds, the
    same property the XLA path gets from per-row vmapped keys.

The deterministic part (filters + greedy argmax) matches the XLA path
exactly up to bisection-boundary ties, which is what the parity tests pin.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_BISECT_ITERS = 24  # matches sampling/sample.py


def _typical_mask(logits, typical_mass, typical_min_tokens):
    """Survivor mask of the locally-typical filter (bisection form,
    identical math to sampling/sample.typical_filter)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    plogp = jnp.where(p > 0, log_p * p, 0.0)
    entropy = -jnp.sum(plogp, axis=-1, keepdims=True)
    c = jnp.abs(-log_p - entropy)
    c = jnp.where(jnp.isfinite(c), c, jnp.inf)
    finite_max = jnp.max(jnp.where(jnp.isfinite(c), c, 0.0), axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        within = c <= mid
        mass_ok = jnp.sum(jnp.where(within, p, 0.0), axis=-1, keepdims=True) >= typical_mass
        count = jnp.sum(jnp.where(within, 1.0, 0.0), axis=-1, keepdims=True)
        ok = mass_ok & (count >= typical_min_tokens)
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, _BISECT_ITERS, body, (jnp.zeros_like(finite_max), finite_max)
    )
    return c <= hi


def _top_p_mask(logits, top_p):
    """Survivor mask of nucleus filtering (bisection form, identical math to
    sampling/sample._top_p_filter)."""
    p = jax.nn.softmax(logits, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True) <= top_p
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, _BISECT_ITERS, body,
        (jnp.zeros(p.shape[:-1] + (1,), p.dtype), jnp.max(p, axis=-1, keepdims=True)),
    )
    return p > lo


def _kernel(
    # scalar-prefetch refs (full arrays in SMEM, indexed by program_id)
    seed_ref,  # (b, 2) uint32 — per-row keys
    step_ref,  # (1,) int32
    temp_ref,  # (b,) f32
    topp_ref,  # (b,) f32 (ignored unless use_top_p)
    flag_ref,  # (b,) f32 — >0.5 = sample, else greedy
    logits_ref,  # VMEM (1, BF, V) f32
    token_ref,  # VMEM (1, 1, BF) int32 out
    prob_ref,  # VMEM (1, 1, BF) f32 out
    *,
    typical_filtering: bool,
    typical_mass: float,
    typical_min_tokens: int,
    use_top_p: bool,
):
    i = pl.program_id(0)  # row
    logits = logits_ref[0]  # (BF, V) f32
    if typical_filtering:
        logits = jnp.where(
            _typical_mask(logits, typical_mass, typical_min_tokens), logits, NEG_INF
        )
    if use_top_p:
        logits = jnp.where(_top_p_mask(logits, topp_ref[i]), logits, NEG_INF)

    t = jnp.maximum(temp_ref[i], 1e-10)
    scaled = logits / t
    # numerically-stable softmax for the selected-token probability
    m = jnp.max(scaled, axis=-1, keepdims=True)
    e = jnp.exp(scaled - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    # per-(row, step, block) stream: row identity is the key itself; step and
    # block are mixed into the two seed words (golden-ratio odd constants)
    # rather than passed as extra operands — 4-operand prng_seed trips a
    # Mosaic verifier bug on this backend
    s0 = seed_ref[i, 0] ^ (step_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    s1 = seed_ref[i, 1] ^ (
        (jnp.uint32(pl.program_id(1)) + jnp.uint32(1)) * jnp.uint32(0x85EBCA6B)
    )
    pltpu.prng_seed(s0, s1)
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # 23 high bits -> exactly-representable float in (0, 1): u can round to
    # neither 0 nor 1, keeping both logs finite
    # Mosaic has no uint32->f32 cast; after >>9 the value fits int32 exactly
    u = (
        (bits >> 9).astype(jnp.int32).astype(jnp.float32) * (1.0 / 8388608.0)
        + (0.5 / 16777216.0)
    )
    gumbel = -jnp.log(-jnp.log(u))

    noisy = jnp.where(flag_ref[i] > 0.5, scaled + gumbel, logits)
    # manual argmax (first max wins): Mosaic's argmax lowering trips an
    # f32->i32 legalization bug on this backend
    v = scaled.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, noisy.shape, 1)
    nmax = jnp.max(noisy, axis=-1, keepdims=True)
    is_max = noisy >= nmax
    token = jnp.min(jnp.where(is_max, iota, v), axis=-1).astype(jnp.int32)  # (BF,)
    onehot = iota == token[:, None]
    token_ref[0, 0, :] = token
    prob_ref[0, 0, :] = jnp.sum(jnp.where(onehot, probs, 0.0), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "typical_filtering", "typical_mass", "typical_min_tokens", "use_top_p",
        "block_f", "interpret",
    ),
)
def fused_sample_from_logits(
    row_keys_u32: jnp.ndarray,  # (b, 2) uint32 — one key per row
    step: jnp.ndarray,  # scalar int32 — MaskGIT step index
    logits: jnp.ndarray,  # (b, flat, v) f32
    temperature: jnp.ndarray,  # (b,) or scalar f32
    do_sample: jnp.ndarray,  # (b,) or scalar bool/f32
    top_p: Optional[jnp.ndarray] = None,  # (b,) or scalar f32
    typical_filtering: bool = True,
    typical_mass: float = 0.15,
    typical_min_tokens: int = 64,
    use_top_p: bool = False,
    block_f: int = 432,
    interpret: bool = False,
):
    """Returns (tokens (b, flat) int32, selected_probs (b, flat) f32)."""
    b, flat, v = logits.shape
    if interpret:
        bf = min(block_f, flat)
    else:
        # TPU tiling rule: block dims must be multiples of (8, 128) or equal
        # the array dims
        bf = flat if flat <= block_f else max(128, (block_f // 128) * 128)
    grid = (b, pl.cdiv(flat, bf))

    def per_row(x, default=0.0):
        return jnp.broadcast_to(
            jnp.asarray(default if x is None else x, jnp.float32), (b,)
        )

    temp = per_row(temperature, 1.0)
    topp = per_row(top_p, 1.0)
    flag = per_row(jnp.asarray(do_sample, jnp.float32), 1.0)
    step_arr = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bf, v), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bf), lambda i, j, *_: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bf), lambda i, j, *_: (i, 0, j), memory_space=pltpu.VMEM),
        ),
    )
    tokens, probs = pl.pallas_call(
        functools.partial(
            _kernel,
            typical_filtering=typical_filtering,
            typical_mass=typical_mass,
            typical_min_tokens=typical_min_tokens,
            use_top_p=use_top_p,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, flat), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, flat), jnp.float32),
        ),
        grid_spec=grid_spec,
        # the generic interpreter has no prng_seed; the TPU-semantics
        # interpreter does (it stubs random bits to zeros — noise-path tests
        # run on real hardware, deterministic-path tests run anywhere)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        row_keys_u32.astype(jnp.uint32), step_arr, temp, topp, flag,
        logits.astype(jnp.float32),
    )
    return tokens[:, 0, :], probs[:, 0, :]
