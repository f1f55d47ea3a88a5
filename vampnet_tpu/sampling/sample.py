"""Token sampling ops: temperature / typical filtering / top-k / top-p and
gumbel-confidence re-masking.

Reimplements reference vampnet/modules/transformer.py:952-1103 as pure,
vectorized, jit-traceable JAX — sorts and masked scatters instead of
data-dependent shapes, so the whole MaskGIT loop stays on-device.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf

# bisection iterations for threshold filters; 24 halvings resolve the
# threshold to ~3e-6 of the logit range — far below sampling noise, and the
# loop is HBM-bound (2 full-vocab reads per iteration)
_BISECT_ITERS = 24


def keys_are_batched(key: jax.Array) -> bool:
    """True if `key` is a per-row batch of PRNG keys rather than a single key.

    Supports both typed key arrays (jax.random.key: scalar vs (b,)) and raw
    uint32 keys (jax.random.PRNGKey: (2,) vs (b, 2)). Per-row keys give each
    batch row an independent noise stream, so a row's sampled tokens do not
    depend on its batch-mates (serving determinism: solo == batched).
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def fold_in_rows(keys: jax.Array, data) -> jax.Array:
    """Per-row jax.random.fold_in over a batch of keys."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, data)


def gumbel_noise_like(key: jax.Array, t: jnp.ndarray) -> jnp.ndarray:
    """Gumbel(0,1) noise shaped like t (reference transformer.py:28-30)."""
    return jax.random.gumbel(key, t.shape)


def gumbel_sample(key: jax.Array, t: jnp.ndarray, temperature: float = 1.0, axis: int = -1):
    """Gumbel-max categorical sample (reference transformer.py:33-34)."""
    return jnp.argmax(
        t / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-10)
        + gumbel_noise_like(key, t),
        axis=axis,
    )


def typical_filter(
    logits: jnp.ndarray,  # (..., vocab)
    typical_mass: float = 0.2,
    typical_min_tokens: int = 1,
) -> jnp.ndarray:
    """Locally-typical filtering (reference transformer.py:1076-1103).

    Keeps the tokens whose surprisal is closest to the distribution entropy
    until `typical_mass` cumulative probability is covered (always keeping at
    least `typical_min_tokens`); the rest are set to -inf.

    TPU-native formulation: the reference sorts the vocab and scans the
    cumulative mass (sorts + gathers + scatters — ~300 ms/step on a v5e at
    VampNet shapes). The kept set {c <= tau*} is fully determined by the
    scalar threshold tau* = smallest tau with mass({c<=tau}) >= typical_mass
    and count({c<=tau}) >= min_tokens, so we bisect tau with fused masked
    reductions instead: ~100x faster, identical result up to ties at the
    cutoff (float-measure zero; parity-tested against torch).
    """
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    # nansum in the reference: 0 * -inf -> 0
    plogp = jnp.where(p > 0, log_p * p, 0.0)
    entropy = -jnp.sum(plogp, axis=-1, keepdims=True)

    c = jnp.abs(-log_p - entropy)  # typicality distance; -inf logits -> +inf
    c = jnp.where(jnp.isfinite(c), c, jnp.inf)

    finite_max = jnp.max(jnp.where(jnp.isfinite(c), c, 0.0), axis=-1, keepdims=True)
    lo = jnp.zeros_like(finite_max)
    hi = finite_max

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        within = c <= mid
        mass_ok = jnp.sum(jnp.where(within, p, 0.0), axis=-1, keepdims=True) >= typical_mass
        count_ok = (
            jnp.sum(within, axis=-1, keepdims=True) >= typical_min_tokens
        )
        ok = mass_ok & count_ok
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    remove = c > hi
    return jnp.where(remove, NEG_INF, logits)


def _top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep only the top_k logits (reference transformer.py:996-998)."""
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _top_p_filter(logits: jnp.ndarray, top_p) -> jnp.ndarray:
    """Nucleus filtering (reference transformer.py:1001-1016); `top_p` may be
    a traced scalar or (...,1)-broadcastable array.

    Bisection form (see typical_filter): token i survives iff the probability
    mass strictly above p_i is <= top_p (the reference's right-shifted cumsum
    keeps the first token crossing the threshold). The kept set is
    {p >= tau*}; bisect tau* = smallest tau with mass({p > tau}) <= top_p.
    """
    p = jax.nn.softmax(logits, axis=-1)
    top_p = jnp.asarray(top_p)
    while top_p.ndim < logits.ndim:
        top_p = top_p[..., None]
    lo = jnp.zeros(p.shape[:-1] + (1,), p.dtype)
    hi = jnp.max(p, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True) <= top_p
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    # data values <= lo fail the predicate; values >= hi satisfy it
    remove = p <= lo
    return jnp.where(remove, NEG_INF, logits)


def sample_from_logits(
    key: jax.Array,
    logits: jnp.ndarray,  # (..., vocab)
    sample=True,
    temperature=1.0,
    top_k: Optional[int] = None,
    top_p=None,
    typical_filtering: bool = False,
    typical_mass: float = 0.2,
    typical_min_tokens: int = 1,
    return_probs: bool = False,
):
    """Categorical sampling with the reference's filter pipeline
    (reference transformer.py:952-1034). `sample` and `temperature` may be
    traced (per-call or per-row) values; the filter *structure* is static.
    """
    if typical_filtering:
        logits = typical_filter(
            logits, typical_mass=typical_mass, typical_min_tokens=typical_min_tokens
        )
    if top_k is not None:
        logits = _top_k_filter(logits, top_k)
    if top_p is not None:
        logits = _top_p_filter(logits, top_p)

    temperature = jnp.asarray(temperature, dtype=jnp.float32)
    t = jnp.maximum(temperature, 1e-10)
    while t.ndim < logits.ndim:
        t = t[..., None]
    scaled = logits / t
    probs = jax.nn.softmax(scaled, axis=-1)
    if keys_are_batched(key):
        # per-row draw: row i's tokens depend only on keys[i] + logits[i]
        sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l, axis=-1))(
            key, scaled
        )
    else:
        sampled = jax.random.categorical(key, scaled, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    sample = jnp.asarray(sample)
    while sample.ndim < sampled.ndim:  # per-row flag broadcasts over positions
        sample = sample[..., None]
    token = jnp.where(sample, sampled, greedy)

    if return_probs:
        token_probs = jnp.take_along_axis(probs, token[..., None], axis=-1)[..., 0]
        return token, token_probs
    return token


def mask_by_random_topk(
    key: jax.Array,
    num_to_mask: jnp.ndarray,  # (b, 1) int
    probs: jnp.ndarray,  # (b, seq) selected-token probs; +inf = pinned unmasked
    temperature: jnp.ndarray,  # (b,) or scalar
) -> jnp.ndarray:
    """Gumbel-confidence re-masking (reference transformer.py:1038-1074):
    confidence = log p + temperature * gumbel; the `num_to_mask` least
    confident positions get re-masked."""
    if keys_are_batched(key):
        noise = jax.vmap(lambda k: jax.random.gumbel(k, probs.shape[1:]))(key)
    else:
        noise = jax.random.gumbel(key, probs.shape)
    temperature = jnp.asarray(temperature, dtype=jnp.float32)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    confidence = jnp.log(probs) + temperature * noise
    sorted_confidence = jnp.sort(confidence, axis=-1)
    cut_off = jnp.take_along_axis(sorted_confidence, num_to_mask, axis=-1)
    return confidence < cut_off
