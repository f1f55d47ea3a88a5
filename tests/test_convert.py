"""Weight-converter tests: torch reference checkpoints -> flax trees, and
native .vtpu checkpoint roundtrips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.checkpoints import load_lm, save_lm, save_lora
from vampnet_tpu.convert import infer_lm_config, lm_from_torch_checkpoint
from vampnet_tpu.modules import LMConfig, VampNetLM


def _ref_model_and_ckpt(tmp_path, n_layers=2):
    reft = pytest.importorskip("tests.reference_harness")
    import torch

    mod = reft.load_reference_transformer()
    torch.manual_seed(0)
    ref = mod.VampNet(
        n_heads=4, n_layers=n_layers, n_codebooks=4, n_conditioning_codebooks=0,
        latent_dim=8, embedding_dim=64, vocab_size=32, flash_attn=False, dropout=0.0,
    ).eval()
    path = tmp_path / "coarse.pth"
    torch.save(
        {
            "state_dict": ref.state_dict(),
            "metadata": {"kwargs": {"n_heads": 4, "vocab_size": 32, "dropout": 0.0}},
        },
        path,
    )
    return mod, ref, path


def test_lm_from_torch_checkpoint_logits_parity(tmp_path):
    mod, ref, path = _ref_model_and_ckpt(tmp_path)
    import torch

    cfg, params = lm_from_torch_checkpoint(path)
    assert cfg.n_layers == 2 and cfg.n_codebooks == 4 and cfg.vocab_size == 32
    model = VampNetLM(cfg)

    torch.manual_seed(1)
    cb_t = [torch.randn(32, 8) for _ in range(4)]

    class _CB:
        def __init__(self, w):
            self.codebook = torch.nn.Embedding.from_pretrained(w)

    class _Codec:
        def __init__(self, ws):
            self.quantizer = type("Q", (), {"quantizers": [_CB(w) for w in ws]})()

    codes_np = np.random.default_rng(0).integers(0, 32, (2, 4, 16))
    codes_np[:, :, ::4] = 32  # MASK
    with torch.no_grad():
        latents = ref.embedding.from_codes(torch.tensor(codes_np), _Codec(cb_t))
        ref_logits = ref(latents).numpy()

    codebooks = jnp.stack([jnp.asarray(w.numpy()) for w in cb_t])
    logits = model.apply(
        {"params": params}, jnp.asarray(codes_np), codebooks, method="forward_codes"
    )
    ours = np.asarray(
        jnp.transpose(logits.reshape(2, 16 * 4, 32), (0, 2, 1))
    )
    c = np.corrcoef(ours.ravel(), ref_logits.ravel())[0, 1]
    assert c > 0.999


def test_native_checkpoint_roundtrip(tmp_path):
    cfg = LMConfig(
        n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
        embedding_dim=32, vocab_size=16, dropout=0.0,
    )
    model = VampNetLM(cfg)
    codes = jnp.zeros((1, 2, 8), dtype=jnp.int32)
    cbs = jnp.zeros((2, 16, 4))
    params = model.init(jax.random.PRNGKey(0), codes, cbs, method="forward_codes")["params"]
    path = tmp_path / "m.vtpu"
    save_lm(path, cfg, params)
    cfg2, params2 = load_lm(path)
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_overlay(tmp_path):
    cfg = LMConfig(
        n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
        embedding_dim=32, vocab_size=16, dropout=0.0, lora_r=2,
    )
    model = VampNetLM(cfg)
    codes = jnp.zeros((1, 2, 8), dtype=jnp.int32)
    cbs = jnp.zeros((2, 16, 4))
    params = model.init(jax.random.PRNGKey(0), codes, cbs, method="forward_codes")["params"]

    from vampnet_tpu.modules.lora import lora_state_dict

    # write base + a modified lora overlay
    base_path = tmp_path / "base.vtpu"
    save_lm(base_path, cfg, params)
    lora = jax.tree_util.tree_map(lambda x: x + 1.0, lora_state_dict(params))
    lora_path = tmp_path / "lora.vtpu"
    save_lora(lora_path, lora)

    _, merged = load_lm(base_path, lora_path)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(merged)
    orig = tu.flatten_dict(params)
    for k in flat:
        if k[-1] in ("lora_a", "lora_b"):
            np.testing.assert_allclose(np.asarray(flat[k]), np.asarray(orig[k]) + 1.0)
        else:
            np.testing.assert_array_equal(np.asarray(flat[k]), np.asarray(orig[k]))


def test_lora_from_torch_checkpoint(tmp_path):
    """loralib-style adapter-only torch state dict -> our overlay tree."""
    import torch

    from vampnet_tpu.convert import lora_from_torch_checkpoint

    r, d = 4, 16
    sd = {
        "transformer.layers.0.self_attn.w_qs.lora_A": torch.randn(r, d),
        "transformer.layers.0.self_attn.w_qs.lora_B": torch.randn(d, r),
        "transformer.layers.1.feed_forward.w_1.lora_A": torch.randn(r, d),
        "transformer.layers.1.feed_forward.w_1.lora_B": torch.randn(d * 4, r),
    }
    path = tmp_path / "lora.pth"
    torch.save(sd, path)
    tree = lora_from_torch_checkpoint(path)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree)
    a = flat[("transformer", "layers_0", "self_attn", "w_qs", "lora_a")]
    b = flat[("transformer", "layers_1", "feed_forward", "w_1", "lora_b")]
    assert a.shape == (d, r)  # transposed to our (in, r) layout
    assert b.shape == (r, d * 4)
    np.testing.assert_allclose(
        np.asarray(a), sd["transformer.layers.0.self_attn.w_qs.lora_A"].numpy().T
    )
