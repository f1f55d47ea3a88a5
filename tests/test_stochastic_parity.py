"""Stochastic-regime + cfg-guidance parity vs the RUNNING torch reference
(VERDICT r3 item 2: pin the sampling loop beyond the argmax regime).

tests/test_lockstep_generate.py pins the MaskGIT loop in a DETERMINISTIC
regime (argmax, no gumbel) where every artifact must match bit-for-bit.
This file covers the two remaining axes:

1. cfg_guidance (reference transformer.py:771-783,845-847): the reference
   doubles the batch with an all-masked uncond copy, computes guided logits,
   then DISCARDS them (`logits_cond` is never written back), so its output
   in the deterministic regime equals the no-guidance run. Ours applies the
   standard formula uncond + g*(cond - uncond) (documented divergence,
   sampling/generate.py module docstring): at g=1.0 that reduces to the
   plain conditional logits, so ours(g=1) must equal the reference exactly;
   at g!=1 the guidance must actually change tokens.

2. The STOCHASTIC regime (sample=True multinomial + gumbel-confidence
   re-masking) can never match torch's RNG stream bit-for-bit (different
   generators), so it is pinned DISTRIBUTIONALLY under shared weights:
   across many seeds, (a) the final-token marginals at masked positions and
   (b) the per-step re-mask frequencies must agree within sampling noise.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.sampling import generate
from vampnet_tpu.util import codebook_flatten

torch = pytest.importorskip("torch")
reft = pytest.importorskip("tests.reference_harness")
from tests.test_lockstep_generate import (  # noqa: E402
    COARSE, _build_pair, _make_inputs,
)


def _ref_generate(ref, codec, codes, mask, steps, *, seed=None, **kw):
    if seed is not None:
        torch.manual_seed(seed)
    with torch.no_grad():
        out = ref.generate(
            codec,
            start_tokens=torch.tensor(codes, dtype=torch.long),
            mask=torch.tensor(mask, dtype=torch.long),
            _sampling_steps=steps,
            return_signal=False,
            **kw,
        )
    return out.numpy()


DET = dict(
    temperature=1.0, mask_temperature=0.0, typical_filtering=False,
    sample_cutoff=-1.0,
)


def _our_generate_fn(model, params, codebooks, codes, mask, steps, **kw):
    def forward(zm, c=None, cm=None):
        return model.apply({"params": params}, zm, codebooks, method="forward_codes")

    def run(key):
        return generate(
            forward, key, jnp.asarray(codes), jnp.asarray(mask),
            mask_token=model.config.mask_token,
            n_conditioning_codebooks=model.config.n_conditioning_codebooks,
            sampling_steps=steps, sampler_impl="xla", **kw,
        )

    return jax.jit(run)


def test_cfg_guidance_lockstep_vs_reference():
    steps = 5
    mod, ref, codec, model, params, codebooks = _build_pair(COARSE)
    codes, mask = _make_inputs(COARSE, b=1, t=16, seed=11)

    # (a) pin the reference quirk: cfg_guidance is output-neutral there
    ref_plain = _ref_generate(ref, codec, codes, mask, steps, **DET)
    ref_guided = _ref_generate(
        ref, codec, codes, mask, steps, cfg_guidance=3.0, **DET
    )
    np.testing.assert_array_equal(
        ref_guided, ref_plain,
        err_msg="reference cfg_guidance stopped being a no-op — revisit "
        "the documented divergence in sampling/generate.py",
    )

    # (b) ours at g=1.0 reduces to the conditional logits -> exact lockstep
    ours_g1 = np.asarray(
        _our_generate_fn(
            model, params, codebooks, codes, mask, steps, cfg_guidance=1.0, **DET
        )(jax.random.PRNGKey(0))
    )
    np.testing.assert_array_equal(ours_g1, ref_plain)

    # (c) real guidance must bite: g far from 1 changes the tokens
    ours_g4 = np.asarray(
        _our_generate_fn(
            model, params, codebooks, codes, mask, steps, cfg_guidance=4.0, **DET
        )(jax.random.PRNGKey(0))
    )
    assert not np.array_equal(ours_g4, ref_plain)
    # kept (unmasked) positions survive guidance untouched
    keep = mask == 0
    np.testing.assert_array_equal(ours_g4[keep], codes[keep])


N_SEEDS = 128


def _tvd(a_counts, b_counts):
    p = a_counts / a_counts.sum()
    q = b_counts / b_counts.sum()
    return 0.5 * np.abs(p - q).sum()


def test_stochastic_distributional_parity():
    """Shared weights, full sampling regime (multinomial draws +
    gumbel-confidence re-masking, reference defaults temperature=1,
    mask_temperature=10.5): across N_SEEDS seeds the two frameworks must
    draw from the same distributions. Gates are ~2x the expected
    same-distribution sampling noise at these sample sizes; a systematic
    temperature/noise-scale bug moves these statistics far past them."""
    steps = 4
    cfg = COARSE
    mod, ref, codec, model, params, codebooks = _build_pair(cfg)
    codes, mask = _make_inputs(cfg, b=1, t=16, seed=5)
    flat_mask = np.asarray(
        codebook_flatten(jnp.asarray(mask[:, cfg.n_conditioning_codebooks :, :]))
    )[0].astype(bool)
    masked_pos = np.where(flat_mask)[0]
    vocab = cfg.vocab_size

    stoch = dict(
        temperature=1.0, mask_temperature=10.5, typical_filtering=False,
        sample_cutoff=1.0,
    )

    # ---- reference side: final tokens + per-step re-mask events ----
    ref_counts = np.zeros((len(masked_pos), vocab), np.int64)
    ref_remask = np.zeros((steps, flat_mask.size), np.float64)
    orig_mbrt = mod.mask_by_random_topk
    step_rec = []

    def mbrt(num_to_mask, probs, temperature):
        out = orig_mbrt(num_to_mask, probs, temperature)
        step_rec.append(out.clone().numpy()[0])
        return out

    mod.mask_by_random_topk = mbrt
    try:
        for s in range(N_SEEDS):
            step_rec.clear()
            out = _ref_generate(ref, codec, codes, mask, steps, seed=s, **stoch)
            flat_out = np.asarray(codebook_flatten(jnp.asarray(out)))[0]
            ref_counts[np.arange(len(masked_pos)), flat_out[masked_pos]] += 1
            for i, m in enumerate(step_rec):
                ref_remask[i] += m.astype(np.float64)
    finally:
        mod.mask_by_random_topk = orig_mbrt
    ref_remask /= N_SEEDS

    # ---- our side: same statistics via the jitted loop + debug callback ----
    our_counts = np.zeros((len(masked_pos), vocab), np.int64)
    our_remask = np.zeros((steps, flat_mask.size), np.float64)
    rec = {}

    def callback(step, z_masked, sampled, new_mask, selected_probs, num_to_mask):
        rec[int(step)] = np.asarray(new_mask)

    def forward(zm, c=None, cm=None):
        return model.apply({"params": params}, zm, codebooks, method="forward_codes")

    @jax.jit  # one trace; the debug callback fires per execution
    def gen(key):
        return generate(
            forward, key, jnp.asarray(codes), jnp.asarray(mask),
            mask_token=cfg.mask_token,
            n_conditioning_codebooks=cfg.n_conditioning_codebooks,
            sampling_steps=steps, sampler_impl="xla",
            debug_callback=callback, **stoch,
        )

    for s in range(N_SEEDS):
        rec.clear()
        out = np.asarray(gen(jax.random.PRNGKey(s)))
        jax.effects_barrier()
        flat_out = np.asarray(codebook_flatten(jnp.asarray(out)))[0]
        our_counts[np.arange(len(masked_pos)), flat_out[masked_pos]] += 1
        for i in range(steps):
            our_remask[i] += np.asarray(
                codebook_flatten(jnp.asarray(rec[i]))
            )[0].astype(np.float64)
    our_remask /= N_SEEDS

    # (a) pooled final-token marginals over all masked positions: TVD noise
    # for two same-distribution samples of this size is ~0.04; gate at 2x
    tvd_pooled = _tvd(
        ref_counts.sum(0).astype(np.float64), our_counts.sum(0).astype(np.float64)
    )
    assert tvd_pooled < 0.08, f"pooled token-marginal TVD {tvd_pooled:.3f}"

    # (b) per-step re-mask frequency per position: binomial noise at n=128
    # is sigma ~ 0.044; gate the worst position at ~4.5 sigma and the mean
    # far below it. (The LAST step re-masks nothing on both sides.)
    diff = np.abs(ref_remask - our_remask)
    assert diff.mean() < 0.05, f"mean re-mask frequency diff {diff.mean():.3f}"
    assert diff.max() < 0.2, f"max re-mask frequency diff {diff.max():.3f}"

    # (c) the re-mask COUNT schedule is deterministic given the mask: both
    # sides must re-mask the same number of positions at every step
    np.testing.assert_allclose(
        ref_remask.sum(1), our_remask.sum(1), atol=1e-6,
        err_msg="per-step re-mask totals (gamma schedule) diverged",
    )
