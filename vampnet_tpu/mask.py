"""Mask algebra — pure-functional, jit-traceable JAX.

Reimplements the reference's inference-time mask construction
(reference vampnet/mask.py) with the same semantics and operator names:
masks are int32 arrays of shape (batch, n_codebooks, seq) where
**1 = regenerate, 0 = keep (prompt)**.

All randomness is explicit via `jax.random` keys so mask construction is
seed-stable and can be folded into a jitted vamp step. Static hyperparameters
(period, width, prefix length, ...) are Python ints and participate in trace
specialization; array arguments may be traced.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .util import scalar_to_batch_array


def _gamma(r):
    """Cosine mask schedule (reference vampnet/mask.py:8)."""
    r = jnp.asarray(r)
    return jnp.clip(jnp.cos(r * jnp.pi / 2), 1e-10, 1.0)


def _invgamma(y):
    """Inverse of the cosine schedule (reference vampnet/mask.py:11)."""
    y = jnp.asarray(y)
    return 2 * jnp.arccos(y) / jnp.pi


def full_mask(x: jnp.ndarray) -> jnp.ndarray:
    assert x.ndim == 3, "x must be (batch, n_codebooks, seq)"
    return jnp.ones_like(x, dtype=jnp.int32)


def empty_mask(x: jnp.ndarray) -> jnp.ndarray:
    assert x.ndim == 3, "x must be (batch, n_codebooks, seq)"
    return jnp.zeros_like(x, dtype=jnp.int32)


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray, mask_token: int):
    """Fill masked positions with `mask_token` (reference vampnet/mask.py:24).

    Returns (masked_x, mask) like the reference.
    """
    assert mask.ndim == 3, "mask must be (batch, n_codebooks, seq)"
    assert mask.shape == x.shape, f"shape mismatch {mask.shape} vs {x.shape}"
    mask = mask.astype(jnp.int32)
    return jnp.where(mask.astype(bool), jnp.full_like(x, mask_token), x), mask


def random(key: jax.Array, x: jnp.ndarray, r) -> jnp.ndarray:
    """Bernoulli mask with per-row probability gamma(r) (reference vampnet/mask.py:40)."""
    assert x.ndim == 3, "x must be (batch, n_codebooks, seq)"
    r = jnp.asarray(r)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, x.shape[0])
    probs = _gamma(r)[:, None, None]
    mask = jax.random.bernoulli(key, probs, shape=x.shape)
    return mask.astype(jnp.int32)


def linear_random(key: jax.Array, x: jnp.ndarray, r) -> jnp.ndarray:
    """Bernoulli mask with per-row probability r (no schedule)
    (reference vampnet/mask.py:56)."""
    assert x.ndim == 3, "x must be (batch, n_codebooks, seq)"
    r = jnp.asarray(r, dtype=jnp.float32)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, x.shape[0]).astype(jnp.float32)
    probs = jnp.broadcast_to(r[:, None, None], x.shape)
    mask = jax.random.bernoulli(key, probs)
    return mask.astype(jnp.int32)


def inpaint(x: jnp.ndarray, n_prefix, n_suffix) -> jnp.ndarray:
    """Keep a prefix/suffix, regenerate the middle (reference vampnet/mask.py:75).

    `n_prefix`/`n_suffix` are token counts — scalars or per-batch (batch,) arrays.
    """
    assert n_prefix is not None and n_suffix is not None
    b, c, t = x.shape
    n_prefix = jnp.asarray(n_prefix)
    n_suffix = jnp.asarray(n_suffix)
    if n_prefix.ndim == 0:
        n_prefix = scalar_to_batch_array(n_prefix, b)
    if n_suffix.ndim == 0:
        n_suffix = scalar_to_batch_array(n_suffix, b)
    pos = jnp.arange(t)[None, None, :]
    keep_prefix = pos < n_prefix[:, None, None]
    keep_suffix = pos >= (t - n_suffix)[:, None, None]
    # reference only applies suffix keep when n_suffix > 0 (mask[i,:, -0:] never hit)
    keep_suffix = keep_suffix & (n_suffix[:, None, None] > 0)
    mask = jnp.where(keep_prefix | keep_suffix, 0, 1)
    return jnp.broadcast_to(mask, x.shape).astype(jnp.int32)


def periodic_mask(
    x: jnp.ndarray,
    period: int,
    width: int = 1,
    random_roll: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Unmask (keep) every `period`-th timestep with window `width`
    (reference vampnet/mask.py:101). period==0 -> full mask.

    Vectorized: position t is kept iff some multiple j of `period` (j < seq)
    satisfies j - width//2 <= t <= j + width//2.
    """
    mask = full_mask(x)
    if period == 0:
        return mask
    b, c, t = x.shape
    w2 = width // 2
    pos = jnp.arange(t)
    dmod = pos % period
    near_left = dmod <= w2  # within width of previous multiple (incl. itself)
    # within width of next multiple, which must exist (< t)
    next_mult = pos - dmod + period
    near_right = (period - dmod <= w2) & (next_mult < t)
    keep = near_left | near_right
    mask = jnp.where(keep[None, None, :], 0, 1).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, x.shape)
    if random_roll:
        assert key is not None, "random_roll requires a PRNG key"
        offset = jax.random.randint(key, (), 0, period)
        mask = jnp.roll(mask, offset, axis=-1)
    return mask


def codebook_unmask(mask: jnp.ndarray, n_conditioning_codebooks: Optional[int]) -> jnp.ndarray:
    """Zero the mask for conditioning codebooks (reference vampnet/mask.py:133)."""
    if n_conditioning_codebooks is None:
        return mask
    cb = jnp.arange(mask.shape[1])[None, :, None]
    return jnp.where(cb < n_conditioning_codebooks, 0, mask)


def codebook_mask(mask: jnp.ndarray, val1: int, val2: Optional[int] = None) -> jnp.ndarray:
    """Force regeneration of codebooks >= val1 (reference vampnet/mask.py:144)."""
    cb = jnp.arange(mask.shape[1])[None, :, None]
    return jnp.where(cb >= val1, 1, mask)


def mask_and(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    assert mask1.shape == mask2.shape, "masks must be same shape"
    return jnp.minimum(mask1, mask2)


def mask_or(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    assert mask1.shape == mask2.shape, "masks must be same shape"
    return jnp.clip(mask1 + mask2, 0, 1)


def dropout(key: jax.Array, mask: jnp.ndarray, p: float) -> jnp.ndarray:
    """Force-regenerate a random fraction p of timesteps
    (reference vampnet/mask.py:162: samples with replacement)."""
    t = mask.shape[-1]
    n_drop = int(t * p)
    if n_drop == 0:
        return mask.astype(jnp.int32)
    idxs = jax.random.randint(key, (n_drop,), 0, t)
    dropped = jnp.zeros((t,), dtype=jnp.int32).at[idxs].set(1)
    return jnp.maximum(mask, dropped[None, None, :]).astype(jnp.int32)


def time_stretch_mask(x: jnp.ndarray, stretch_factor: int) -> jnp.ndarray:
    """Periodic mask matching a repeat-interleave time stretch
    (reference vampnet/mask.py:189)."""
    assert stretch_factor >= 1, "stretch factor must be >= 1"
    return periodic_mask(x, stretch_factor, width=1)


def onset_mask(onset_frame_idxs, z: jnp.ndarray, width: int = 1) -> jnp.ndarray:
    """Keep a window around detected onsets (reference vampnet/mask.py:203).

    `onset_frame_idxs` is a host-side int sequence (onsets are detected on the
    host); the mask itself is built vectorized.
    """
    import numpy as np

    idxs = np.asarray(onset_frame_idxs, dtype=np.int64).reshape(-1)
    t = z.shape[-1]
    keep = np.zeros((t,), dtype=bool)
    for idx in idxs:
        lo = max(0, int(idx) - width)
        hi = min(t, int(idx) + width)
        keep[lo:hi] = True
    mask = jnp.where(jnp.asarray(keep)[None, None, :], 0, 1)
    return jnp.broadcast_to(mask, z.shape).astype(jnp.int32)
