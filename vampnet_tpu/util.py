"""Token layout helpers.

TPU-native reimplementation of the reference's token utilities
(see reference vampnet/util.py:35-46): the classifier and loss operate on a
flattened (batch, time*codebook) layout with *time-major, codebook-minor*
interleaving ("b c t -> b (t c)").
"""
from __future__ import annotations

import jax.numpy as jnp


def codebook_flatten(tokens: jnp.ndarray) -> jnp.ndarray:
    """(batch, codebook, time) -> (batch, time*codebook), interleaved t-major.

    Mirrors reference vampnet/util.py:35 (einops "b c t -> b (t c)").
    """
    b, c, t = tokens.shape
    return jnp.swapaxes(tokens, 1, 2).reshape(b, t * c)


def codebook_unflatten(flat_tokens: jnp.ndarray, n_c: int) -> jnp.ndarray:
    """(batch, time*codebook) -> (batch, codebook, time).

    Mirrors reference vampnet/util.py:41 (einops "b (t c) -> b c t").
    """
    b, tc = flat_tokens.shape
    t = tc // n_c
    return jnp.swapaxes(flat_tokens.reshape(b, t, n_c), 1, 2)


def scalar_to_batch_array(x, batch_size: int) -> jnp.ndarray:
    """Broadcast a scalar to a (batch,) array (reference vampnet/util.py:6)."""
    return jnp.full((batch_size,), x)
