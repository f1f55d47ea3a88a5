"""Lockstep MaskGIT-loop parity against the RUNNING torch reference.

Forward logits, filters, and bucket math have pointwise parity tests
(test_transformer.py / test_sampling.py); this file pins the one axis those
can't: the full `generate()` loop — per-step keep/re-mask decisions,
`num_to_mask` clamping, schedule interaction (reference
vampnet/modules/transformer.py:686-946).

Protocol: both frameworks hold the SAME weights (torch state_dict -> flax
tree via tests/test_transformer._copy_torch_to_flax, fp32 compute on both
sides) and run in a deterministic regime —
    sample_cutoff = -1  -> every step takes argmax (no multinomial RNG)
    mask_temperature = 0 -> confidence = log p, no gumbel noise
so every per-step artifact must match exactly: sampled tokens, selected
probs, the clamped num_to_mask, the re-mask decisions, and the final codes.
The reference side is observed by wrapping its module-level
sample_from_logits / mask_by_random_topk; ours through generate()'s
debug_callback.

Known, documented divergences exercised here:
  * typical filtering: the reference's sample_from_logits DISCARDS
    typical_filter's return value (transformer.py:989-993 — the function is
    non-mutating), so the running reference never filters; ours does
    (docs/PARITY.md). Lockstep therefore runs typical_filtering=False, and
    one test pins the reference no-op itself.
  * batch semantics: the reference's num_mask_tokens_at_start sums over the
    whole batch (:766); ours is per row. For b>1 we lockstep each row
    against its own b=1 reference run (chunks-as-batch semantics).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.sampling import generate
from vampnet_tpu.util import codebook_flatten

torch = pytest.importorskip("torch")
reft = pytest.importorskip("tests.reference_harness")
from tests.test_transformer import _copy_torch_to_flax  # noqa: E402

COARSE = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=4, n_conditioning_codebooks=0,
    latent_dim=8, embedding_dim=64, vocab_size=32, dropout=0.0,
    compute_dtype="float32",
)
C2F = dataclasses.replace(COARSE, n_codebooks=6, n_conditioning_codebooks=2)


class _FakeCodec:
    """Exposes quantizer codebook weights (reference layers.py:145)."""

    def __init__(self, weights):
        class _CB:
            def __init__(self, w):
                self.codebook = torch.nn.Embedding.from_pretrained(w)

        class _Q:
            def __init__(self, ws):
                self.quantizers = [_CB(w) for w in ws]

        self.quantizer = _Q(weights)


def _build_pair(cfg, seed=0):
    """Reference torch VampNet + our flax model holding identical weights."""
    mod = reft.load_reference_transformer()
    torch.manual_seed(seed)
    ref = mod.VampNet(
        n_heads=cfg.n_heads, n_layers=cfg.n_layers, n_codebooks=cfg.n_codebooks,
        n_conditioning_codebooks=cfg.n_conditioning_codebooks,
        latent_dim=cfg.latent_dim, embedding_dim=cfg.embedding_dim,
        vocab_size=cfg.vocab_size, flash_attn=False, dropout=0.0,
    ).eval()
    torch.manual_seed(seed + 1)
    cb_t = [
        torch.randn(cfg.vocab_size, cfg.latent_dim) for _ in range(cfg.n_codebooks)
    ]
    codec = _FakeCodec(cb_t)
    codebooks = jnp.stack([jnp.asarray(w.numpy()) for w in cb_t])

    model = VampNetLM(cfg)
    codes0 = jnp.zeros((1, cfg.n_codebooks, 8), dtype=jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), codes0, codebooks, method="forward_codes"
    )["params"]
    params = _copy_torch_to_flax(ref, params, cfg)
    return mod, ref, codec, model, params, codebooks


def _make_inputs(cfg, b, t, seed=0):
    """Random codes + a partial mask (zeros on conditioning codebooks)."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, cfg.vocab_size, (b, cfg.n_codebooks, t))
    mask = (rng.random((b, cfg.n_codebooks, t)) < 0.7).astype(np.int64)
    mask[:, : cfg.n_conditioning_codebooks, :] = 0
    # every row keeps a few unmasked positions and a healthy masked count
    mask[:, cfg.n_conditioning_codebooks :, :2] = 0
    mask[:, cfg.n_conditioning_codebooks :, 2:6] = 1
    return codes, mask


def _run_reference(mod, ref, codec, codes, mask, steps, temperature, top_p):
    """Run reference generate(), recording each step's sampling artifacts."""
    rec = {"probs": [], "num": [], "mask": []}
    orig_mbrt = mod.mask_by_random_topk

    def mbrt(num_to_mask, probs, temperature):
        out = orig_mbrt(num_to_mask, probs, temperature)
        rec["num"].append(num_to_mask.clone().numpy())
        rec["probs"].append(probs.clone().numpy())
        rec["mask"].append(out.clone().numpy())
        return out

    mod.mask_by_random_topk = mbrt
    try:
        out = ref.generate(
            codec,
            start_tokens=torch.tensor(codes, dtype=torch.long),
            mask=torch.tensor(mask, dtype=torch.long),
            _sampling_steps=steps,
            temperature=temperature,
            mask_temperature=0.0,
            typical_filtering=False,
            top_p=top_p,
            sample_cutoff=-1.0,  # argmax every step
            return_signal=False,
        )
    finally:
        mod.mask_by_random_topk = orig_mbrt
    return out.numpy(), rec


def _run_ours(model, params, codebooks, codes, mask, steps, temperature, top_p,
              typical_filtering=False):
    """Run our generate(), recording per-step state via debug_callback."""
    rec = {}

    def callback(step, z_masked, sampled, new_mask, selected_probs, num_to_mask):
        rec[int(step)] = dict(
            z_masked=np.asarray(z_masked),
            sampled=np.asarray(sampled),
            mask=np.asarray(new_mask),
            probs=np.asarray(selected_probs),
            num=np.asarray(num_to_mask),
        )

    def forward(zm, c=None, cm=None):
        return model.apply({"params": params}, zm, codebooks, method="forward_codes")

    out = generate(
        forward,
        jax.random.PRNGKey(0),  # deterministic regime: never reaches outputs
        jnp.asarray(codes),
        jnp.asarray(mask),
        mask_token=model.config.mask_token,
        n_conditioning_codebooks=model.config.n_conditioning_codebooks,
        sampling_steps=steps,
        temperature=temperature,
        mask_temperature=0.0,
        typical_filtering=typical_filtering,
        top_p=top_p,
        sample_cutoff=-1.0,
        sampler_impl="xla",
        debug_callback=callback,
    )
    out = np.asarray(out)
    jax.effects_barrier()
    return out, rec


def _assert_lockstep(ref_rec, ours_rec, steps, n_infer):
    for i in range(steps):
        ours = ours_rec[i]
        # clamped num_to_mask (ref shape (b,1); ours (b,))
        np.testing.assert_array_equal(
            ours["num"], ref_rec["num"][i][:, 0],
            err_msg=f"step {i}: num_to_mask",
        )
        # selected probs post keep-merge (+inf at kept positions)
        np.testing.assert_allclose(
            ours["probs"], ref_rec["probs"][i], atol=1e-5,
            err_msg=f"step {i}: selected_probs",
        )
        # re-mask decisions
        ours_mask = np.asarray(codebook_flatten(jnp.asarray(ours["mask"])))
        np.testing.assert_array_equal(
            ours_mask.astype(bool), ref_rec["mask"][i],
            err_msg=f"step {i}: re-mask decisions",
        )


@pytest.mark.parametrize(
    "cfg,steps,temperature,top_p",
    [
        (COARSE, 6, 1.0, None),
        (COARSE, 6, 2.0, 0.9),  # top_p IS applied in-place by the reference
        (C2F, 2, 1.0, None),  # c2f regime: conditioning codebooks, 2 steps
    ],
    ids=["coarse", "coarse-topp", "c2f"],
)
def test_lockstep_generate_b1(cfg, steps, temperature, top_p):
    mod, ref, codec, model, params, codebooks = _build_pair(cfg)
    codes, mask = _make_inputs(cfg, b=1, t=16)
    ref_out, ref_rec = _run_reference(
        mod, ref, codec, codes, mask, steps, temperature, top_p
    )
    ours_out, ours_rec = _run_ours(
        model, params, codebooks, codes, mask, steps, temperature, top_p
    )
    _assert_lockstep(ref_rec, ours_rec, steps, cfg.n_predict_codebooks)
    np.testing.assert_array_equal(ours_out, ref_out, err_msg="final codes")


def test_lockstep_generate_batched_rows():
    """b>1: each of our batch rows must equal its own b=1 reference run (the
    documented per-row N0 divergence: chunks-as-batch keeps the reference's
    per-chunk schedule, sampling/generate.py docstring)."""
    cfg, steps = COARSE, 5
    mod, ref, codec, model, params, codebooks = _build_pair(cfg)
    codes, mask = _make_inputs(cfg, b=3, t=16, seed=7)
    ref_rows = [
        _run_reference(
            mod, ref, codec, codes[r : r + 1], mask[r : r + 1], steps, 1.0, None
        )[0]
        for r in range(3)
    ]
    ours_out, _ = _run_ours(model, params, codebooks, codes, mask, steps, 1.0, None)
    np.testing.assert_array_equal(ours_out, np.concatenate(ref_rows, axis=0))


def test_reference_typical_filter_is_noop_at_generate_time():
    """Pin the documented reference quirk: its sample_from_logits discards
    typical_filter's (non-mutating) result, so typical_filtering=True changes
    nothing in the running reference — which is why lockstep runs with the
    flag off and our real typical filter is a deliberate divergence."""
    cfg, steps = COARSE, 4
    mod, ref, codec, model, params, codebooks = _build_pair(cfg)
    codes, mask = _make_inputs(cfg, b=1, t=16, seed=3)

    def run(typical):
        out = ref.generate(
            codec,
            start_tokens=torch.tensor(codes, dtype=torch.long),
            mask=torch.tensor(mask, dtype=torch.long),
            _sampling_steps=steps,
            temperature=1.0,
            mask_temperature=0.0,
            typical_filtering=typical,
            typical_mass=0.15,
            typical_min_tokens=1,
            sample_cutoff=-1.0,
            return_signal=False,
        )
        return out.numpy()

    np.testing.assert_array_equal(run(True), run(False))
