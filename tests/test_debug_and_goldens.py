"""Debug harness dumps + golden-token seed-stability regression."""
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.sampling import build_generate_fn, generate
from vampnet_tpu.sampling.debug import save_debug_dumps
from vampnet_tpu.sampling.sample import gumbel_noise_like, gumbel_sample

CFG = LMConfig(
    n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
    embedding_dim=32, vocab_size=32, dropout=0.0,
)


def _setup():
    model = VampNetLM(CFG)
    codes = jax.random.randint(jax.random.PRNGKey(2), (1, 2, 16), 0, 32)
    cbs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 4))
    params = model.init(jax.random.PRNGKey(0), codes, cbs, method="forward_codes")["params"]
    return model, params, cbs, codes


def test_debug_dumps_per_step(tmp_path):
    model, params, cbs, codes = _setup()
    mask = jnp.ones_like(codes)

    def forward(zm, c=None, cm=None):
        return model.apply({"params": params}, zm, cbs, method="forward_codes")

    out = generate(
        forward, jax.random.PRNGKey(0), codes, mask, CFG.mask_token,
        sampling_steps=3, typical_filtering=False,
        debug_callback=save_debug_dumps(str(tmp_path / "dbg"), save_png=False),
    )
    jax.block_until_ready(out)
    jax.effects_barrier()
    for i in range(3):
        d = tmp_path / "dbg" / f"step_{i}"
        assert (d / "state.npz").exists(), f"missing dump for step {i}"
        data = np.load(d / "state.npz")
        assert data["mask"].shape == (1, 2, 16)


def test_gumbel_helpers():
    key = jax.random.PRNGKey(0)
    t = jnp.zeros((4, 8))
    g = gumbel_noise_like(key, t)
    assert g.shape == t.shape
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    s = gumbel_sample(key, logits, temperature=0.01)
    assert int(s[0]) == 1  # low temperature -> argmax


def test_golden_tokens_seed_stability():
    """Fixed seeds + fixed tiny config must produce identical tokens across
    runs/refactors (our framework's seed-reproducibility contract —
    BASELINE.json parity requirement). If an INTENTIONAL sampling-semantics
    change breaks this, update the golden hash in the same commit."""
    model, params, cbs, codes = _setup()
    gen = build_generate_fn(model, sampling_steps=4, typical_filtering=True,
                            typical_mass=0.3, typical_min_tokens=4)
    mask = jnp.ones_like(codes)
    out = gen(params, cbs, jax.random.PRNGKey(123), codes, mask, 1.0, 10.5, 0.0, 1.0)
    digest = hashlib.sha256(np.asarray(out).astype(np.int32).tobytes()).hexdigest()
    out2 = gen(params, cbs, jax.random.PRNGKey(123), codes, mask, 1.0, 10.5, 0.0, 1.0)
    assert hashlib.sha256(np.asarray(out2).astype(np.int32).tobytes()).hexdigest() == digest
    # cross-process golden (recorded on CPU backend, jax 0.9 threefry).
    # Updated for the round-2 per-ROW N0 MaskGIT schedule (intentional
    # semantics fix, see sampling/generate.py docstring).
    GOLDEN = "f4baeaecab15fb328d24a4d793fa8eb556f095c07b52c8fbe0c37cc02b31597a"
    if GOLDEN != "__RECORD__":
        assert digest == GOLDEN, f"token stream changed: {digest}"
    else:
        print(f"GOLDEN DIGEST: {digest}")
