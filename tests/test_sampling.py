"""Sampler tests: filter math parity vs the reference torch code, and
structural properties of the jitted MaskGIT loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.sampling import generate, build_generate_fn, typical_filter
from vampnet_tpu.sampling.sample import _top_k_filter, _top_p_filter, mask_by_random_topk

KEY = jax.random.PRNGKey(0)


def test_typical_filter_matches_reference_torch():
    reft = pytest.importorskip("tests.reference_harness")
    import torch

    mod = reft.load_reference_transformer()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 6, 50)).astype(np.float32) * 3
    ref = mod.typical_filter(
        torch.tensor(logits.copy()), typical_mass=0.3, typical_min_tokens=5
    ).numpy()
    ours = np.asarray(
        typical_filter(jnp.asarray(logits), typical_mass=0.3, typical_min_tokens=5)
    )
    # -inf positions must agree exactly; finite values unchanged
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref))
    np.testing.assert_allclose(
        ours[~np.isinf(ours)], ref[~np.isinf(ref)], atol=1e-6
    )


def test_typical_filter_min_tokens():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 20)).astype(np.float32))
    out = typical_filter(logits, typical_mass=0.01, typical_min_tokens=8)
    kept = (~np.isinf(np.asarray(out))).sum(axis=-1)
    assert (kept >= 8).all()


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.0]])
    out = np.asarray(_top_k_filter(logits, 2))
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 3])
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0


def test_top_p_filter_keeps_first_over_threshold():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(_top_p_filter(logits, 0.6))
    # cum: .5, .8 — keep first two (right-shifted), drop rest
    assert not np.isinf(out[0, 0]) and not np.isinf(out[0, 1])
    assert np.isinf(out[0, 2]) and np.isinf(out[0, 3])


def test_mask_by_random_topk_pins_inf():
    probs = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (2, 30)).astype(np.float32))
    probs = probs.at[:, :10].set(jnp.inf)  # pinned (already-kept) positions
    num = jnp.full((2, 1), 5, dtype=jnp.int32)
    m = np.asarray(mask_by_random_topk(KEY, num, probs, jnp.asarray([1.0, 1.0])))
    assert not m[:, :10].any()  # inf confidence never re-masked
    assert (m.sum(axis=-1) == 5).all()


def _tiny_setup(b=2, t=12, steps=4, ncc=0, n_cb=4):
    cfg = LMConfig(
        n_heads=4, n_layers=2, n_codebooks=n_cb, n_conditioning_codebooks=ncc,
        latent_dim=8, embedding_dim=64, vocab_size=32, dropout=0.0,
    )
    model = VampNetLM(cfg)
    codebooks = jax.random.normal(jax.random.PRNGKey(1), (n_cb, 32, 8))
    codes = jax.random.randint(jax.random.PRNGKey(2), (b, n_cb, t), 0, 32)
    params = model.init(jax.random.PRNGKey(0), codes, codebooks, method="forward_codes")["params"]
    gen = build_generate_fn(model, sampling_steps=steps, typical_filtering=True,
                            typical_mass=0.2, typical_min_tokens=2)
    return cfg, model, params, codebooks, codes, gen


def test_generate_fills_and_preserves():
    cfg, model, params, codebooks, codes, gen = _tiny_setup()
    mask = jnp.zeros_like(codes).at[:, :, ::2].set(1)
    out = gen(params, codebooks, KEY, codes, mask, 1.0, 10.5, 0.0, 1.0)
    out = np.asarray(out)
    assert out.shape == codes.shape
    # no mask tokens remain
    assert (out != cfg.mask_token).all()
    # unmasked positions preserved exactly
    np.testing.assert_array_equal(out[:, :, 1::2], np.asarray(codes)[:, :, 1::2])
    # masked positions resampled within vocab
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_generate_deterministic_given_key():
    cfg, model, params, codebooks, codes, gen = _tiny_setup()
    mask = jnp.ones_like(codes)
    o1 = gen(params, codebooks, KEY, codes, mask, 1.0, 10.5, 0.0, 1.0)
    o2 = gen(params, codebooks, KEY, codes, mask, 1.0, 10.5, 0.0, 1.0)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = gen(params, codebooks, jax.random.PRNGKey(9), codes, mask, 1.0, 10.5, 0.0, 1.0)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_generate_conditioning_codebooks_passthrough():
    cfg, model, params, codebooks, codes, gen = _tiny_setup(ncc=2, n_cb=6)
    mask = jnp.ones_like(codes)
    out = gen(params, codebooks, KEY, codes, mask, 1.0, 10.5, 0.0, 1.0)
    # conditioning codebooks pass through untouched
    np.testing.assert_array_equal(np.asarray(out)[:, :2], np.asarray(codes)[:, :2])


def test_generate_temperature_sweep_no_recompile():
    cfg, model, params, codebooks, codes, gen = _tiny_setup()
    mask = jnp.ones_like(codes)
    # per-call traced temperature; compiled once
    n0 = gen._cache_size() if hasattr(gen, "_cache_size") else None
    for temp in [0.8, 1.0, 1.2]:
        gen(params, codebooks, KEY, codes, mask, temp, 10.5, 0.0, 1.0)
    if n0 is not None:
        assert gen._cache_size() == 1


def test_generate_schedule_counts_mask_tokens_per_row():
    """N0 must be counted per batch row, not summed over the batch: chunks of
    one song become batch rows, and a batch-summed N0 saturates the
    remaining-1 clamp (schedule collapses to ~1 committed token/row/step)."""
    cfg, model, params, codebooks, codes, _ = _tiny_setup(b=4, t=12, steps=6)
    from vampnet_tpu.mask import _gamma

    steps = 6
    mask = jnp.ones_like(codes)  # fully masked: N0_row = n_cb * t = 48
    n0_row = codes.shape[1] * codes.shape[2]

    remasked_per_row = []

    def cb(i, z_masked_new, sampled, new_mask, selected_probs, num_to_mask):
        remasked_per_row.append((int(i), np.asarray(new_mask).sum(axis=(1, 2))))

    def forward(z_masked):
        return model.apply(
            {"params": params}, z_masked, codebooks, method="forward_codes"
        )

    generate(
        forward, KEY, codes, mask, mask_token=cfg.mask_token,
        sampling_steps=steps, debug_callback=cb,
    )
    jax.effects_barrier()
    by_step = dict(remasked_per_row)
    for i in range(steps - 1):
        r = (i + 1) / steps
        expected = min(max(1, int(np.floor(float(_gamma(r)) * n0_row))), n0_row - 1)
        np.testing.assert_array_equal(by_step[i], expected)
    np.testing.assert_array_equal(by_step[steps - 1], 0)  # last step commits all


def test_generate_cfg_guidance_with_per_row_params():
    """cfg_guidance doubles the batch; per-row (b,) sampling params must be
    tiled for the appended unconditional rows instead of crashing the trace."""
    cfg, model, params, codebooks, codes, _ = _tiny_setup(b=2, t=8, steps=3)

    def forward(z_masked):
        return model.apply(
            {"params": params}, z_masked, codebooks, method="forward_codes"
        )

    out = generate(
        forward, KEY, codes, jnp.ones_like(codes), mask_token=cfg.mask_token,
        sampling_steps=3, cfg_guidance=1.5,
        temperature=jnp.asarray([0.8, 1.2]),
        mask_temperature=jnp.asarray([10.5, 4.0]),
        top_p=jnp.asarray([0.9, 0.8]),
        sample_cutoff=jnp.asarray([1.0, 0.5]),
    )
    out = np.asarray(out)
    assert out.shape == codes.shape  # uncond rows stripped
    assert (out != cfg.mask_token).all()
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
