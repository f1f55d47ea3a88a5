"""Training-time mask variants — pure-functional JAX.

Reimplements reference vampnet/newmask.py (stemgen-style per-codebook masks,
hierarchical `hugo_random`, prefix `tria_mask`, `drop_ones`) with vectorized
lax ops instead of the reference's Python loops. Masks are int32,
1 = regenerate / 0 = keep; several builders also return an
`ignore_indices_mask` marking positions excluded from the loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mask import (  # noqa: F401  (re-exported like the reference module)
    _gamma,
    _invgamma,
    apply_mask,
    codebook_mask,
    codebook_unmask,
    empty_mask,
    full_mask,
    inpaint,
    linear_random,
    mask_and,
    mask_or,
    periodic_mask,
    time_stretch_mask,
)
from .util import scalar_to_batch_array


def random(key: jax.Array, x: jnp.ndarray, r):
    """Cosine-schedule Bernoulli mask + empty ignore mask
    (reference vampnet/newmask.py:40)."""
    assert x.ndim == 3
    r = jnp.asarray(r)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, x.shape[0])
    probs = _gamma(r)[:, None, None]
    mask = jax.random.bernoulli(key, probs, shape=x.shape).astype(jnp.int32)
    return mask, jnp.zeros_like(mask, dtype=bool)


def random_along_time(key: jax.Array, x: jnp.ndarray, r):
    """(batch, seq) Bernoulli mask over time only (reference vampnet/newmask.py:56)."""
    assert x.ndim == 3
    r = jnp.asarray(r)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, x.shape[0])
    probs = _gamma(r)[:, None]
    mask = jax.random.bernoulli(key, probs, shape=(x.shape[0], x.shape[-1]))
    return mask.astype(jnp.int32)


def stemgen_random(key: jax.Array, x: jnp.ndarray, r):
    """Per-batch random codebook level: levels below unmasked+ignored, level c
    Bernoulli(r)-masked, levels above masked+ignored
    (reference vampnet/newmask.py:71, vectorized)."""
    assert x.ndim == 3
    nb, nc, nt = x.shape
    r = jnp.asarray(r)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, nb)
    k_level, k_bern = jax.random.split(key)
    c = jax.random.randint(k_level, (nb,), 0, nc)
    level_mask = jax.random.bernoulli(k_bern, r[:, None], shape=(nb, nt)).astype(jnp.int32)
    cb = jnp.arange(nc)[None, :, None]
    below = cb < c[:, None, None]
    above = cb > c[:, None, None]
    at = cb == c[:, None, None]
    mask = jnp.where(below, 0, jnp.where(above, 1, level_mask[:, None, :]))
    ignore = (below | above)
    return mask.astype(jnp.int32), ignore


def hugo_random(key: jax.Array, x: jnp.ndarray, r):
    """Hierarchical mask: the per-(b,t) mask level is nc - sum(bernoulli) - 1;
    codebooks above the level are masked, levels above level+1 are ignored
    (reference vampnet/newmask.py:110)."""
    assert x.ndim == 3
    nb, nc, nt = x.shape
    r = jnp.asarray(r)
    if r.ndim == 0:
        r = scalar_to_batch_array(r, nb).astype(jnp.float32)
    probs = _gamma(r)[:, None, None]
    bern = jax.random.bernoulli(key, probs, shape=x.shape).astype(jnp.int32)
    mask_levels = nc - bern.sum(axis=1) - 1  # (nb, nt)
    cb = jnp.arange(nc)[None, :, None]
    mask = (mask_levels[:, None, :] < cb).astype(jnp.int32)
    ignore_levels = mask_levels + 1
    ignore = ignore_levels[:, None, :] < cb
    return mask, ignore


def drop_ones(key: jax.Array, mask: jnp.ndarray, p: float) -> jnp.ndarray:
    """Set a random p-fraction of the mask's 1s to 0
    (reference vampnet/newmask.py:281, vectorized: each 1 flips w.p. p)."""
    keep = jax.random.bernoulli(key, 1.0 - p, shape=mask.shape)
    return jnp.where(mask.astype(bool) & ~keep, 0, mask).astype(jnp.int32)


def tria_mask(key: jax.Array, codes: jnp.ndarray, min_amt: float = 0.1, max_amt: float = 0.4):
    """Unmask a random-length prefix per batch row (reference vampnet/newmask.py:340)."""
    nb, nc, nt = codes.shape
    amt = jax.random.uniform(key, (nb,)) * (max_amt - min_amt) + min_amt
    n_keep = (amt * nt).astype(jnp.int32)
    pos = jnp.arange(nt)[None, None, :]
    mask = jnp.where(pos < n_keep[:, None, None], 0, 1)
    return jnp.broadcast_to(mask, codes.shape).astype(jnp.int32)


def onset_mask(onset_frame_idxs, z: jnp.ndarray, width: int = 1) -> jnp.ndarray:
    """Reference vampnet/newmask.py:324 (same semantics as mask.onset_mask but
    with torch-slice edge behavior: window [idx-width, idx+width))."""
    from .mask import onset_mask as _om

    return _om(onset_frame_idxs, z, width=width)
