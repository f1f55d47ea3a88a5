"""Fused sampling kernel: deterministic-path parity vs the XLA sampler.

The TPU-semantics interpreter stubs prng_random_bits to zeros, so the noise
path (determinism, solo==batched, draw statistics) is exercised on real
hardware by scratch/bench_sampler.py; here we pin everything deterministic:
filter math, temperature/softmax, per-row params, greedy tokens, selected
probabilities, and ragged block handling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.ops.sampler_kernel import fused_sample_from_logits
from vampnet_tpu.sampling.sample import sample_from_logits


def _keys(b, seed=7):
    return jax.random.split(jax.random.PRNGKey(seed), b).astype(jnp.uint32)


@pytest.mark.parametrize("use_top_p", [False, True])
def test_greedy_matches_xla_filters(use_top_p):
    b, flat, v = 2, 40, 64
    logits = jax.random.normal(jax.random.PRNGKey(0), (b, flat, v)) * 3.0
    temp = jnp.asarray([1.0, 0.7])
    topp = jnp.asarray([0.9, 0.8]) if use_top_p else None

    tok, prob = fused_sample_from_logits(
        _keys(b), 3, logits, temp, 0.0, top_p=topp, use_top_p=use_top_p,
        typical_filtering=True, typical_mass=0.2, typical_min_tokens=4,
        block_f=16, interpret=True,
    )
    ref_tok, ref_prob = sample_from_logits(
        jax.random.PRNGKey(0), logits, sample=False, temperature=temp,
        top_p=topp, typical_filtering=True, typical_mass=0.2,
        typical_min_tokens=4, return_probs=True,
    )
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ref_prob), atol=1e-5)


def test_ragged_flat_blocks():
    """flat not divisible by block_f: trailing block is clipped on write."""
    b, flat, v = 1, 50, 32
    logits = jax.random.normal(jax.random.PRNGKey(1), (b, flat, v))
    tok, prob = fused_sample_from_logits(
        _keys(b), 0, logits, 1.0, 0.0, typical_filtering=False,
        block_f=16, interpret=True,
    )
    assert tok.shape == (b, flat) and prob.shape == (b, flat)
    np.testing.assert_array_equal(
        np.asarray(tok)[0], np.asarray(jnp.argmax(logits, axis=-1))[0]
    )


def test_scalar_params_broadcast():
    b, flat, v = 3, 16, 16
    logits = jax.random.normal(jax.random.PRNGKey(2), (b, flat, v))
    tok, _ = fused_sample_from_logits(
        _keys(b), 0, logits, 0.5, 0.0, typical_filtering=False,
        block_f=16, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(tok), np.asarray(jnp.argmax(logits, axis=-1))
    )
