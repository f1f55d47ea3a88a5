"""Structural + torch-parity tests for the VampNet LM."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.modules.transformer import relative_position_bucket
from vampnet_tpu.util import codebook_flatten

TINY = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=4, n_conditioning_codebooks=0,
    latent_dim=8, embedding_dim=64, vocab_size=32, dropout=0.0,
)


def _init(cfg, key=0, t=16, b=2):
    model = VampNetLM(cfg)
    codes = jnp.zeros((b, cfg.n_codebooks, t), dtype=jnp.int32)
    codebooks = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim)
    )
    variables = model.init(
        jax.random.PRNGKey(key), codes, codebooks, method="forward_codes"
    )
    return model, variables["params"], codebooks


def test_forward_shapes():
    model, params, codebooks = _init(TINY)
    codes = jax.random.randint(jax.random.PRNGKey(2), (2, 4, 16), 0, 32)
    logits = model.apply({"params": params}, codes, codebooks, method="forward_codes")
    assert logits.shape == (2, 16, 4, 32)
    assert logits.dtype == jnp.float32


def test_conditioning_codebooks_reduce_predictions():
    cfg = LMConfig(
        n_heads=4, n_layers=2, n_codebooks=6, n_conditioning_codebooks=2,
        latent_dim=8, embedding_dim=64, vocab_size=32, dropout=0.0,
    )
    model, params, codebooks = _init(cfg)
    codes = jnp.zeros((1, 6, 8), dtype=jnp.int32)
    logits = model.apply({"params": params}, codes, codebooks, method="forward_codes")
    assert logits.shape == (1, 8, 4, 32)  # predicts only non-conditioning books


def test_flat_layout_matches_codebook_flatten():
    # logits reshaped (b, t*c, v) must line up with codebook_flatten of targets
    model, params, codebooks = _init(TINY)
    codes = jax.random.randint(jax.random.PRNGKey(3), (1, 4, 8), 0, 32)
    logits = model.apply({"params": params}, codes, codebooks, method="forward_codes")
    flat = logits.reshape(1, 8 * 4, 32)
    tgt_flat = codebook_flatten(codes)
    assert flat.shape[1] == tgt_flat.shape[1]
    # position j in flat corresponds to t=j//4, c=j%4
    np.testing.assert_array_equal(
        np.asarray(flat[0, 5]), np.asarray(logits[0, 1, 1])
    )


def test_mask_token_embedding_used():
    model, params, codebooks = _init(TINY)
    codes = jnp.zeros((1, 4, 8), dtype=jnp.int32)
    masked = jnp.full((1, 4, 8), TINY.mask_token, dtype=jnp.int32)
    l1 = model.apply({"params": params}, codes, codebooks, method="forward_codes")
    l2 = model.apply({"params": params}, masked, codebooks, method="forward_codes")
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_lora_params_and_noop_init():
    cfg = LMConfig(
        n_heads=4, n_layers=2, n_codebooks=4, latent_dim=8,
        embedding_dim=64, vocab_size=32, dropout=0.0, lora_r=4,
    )
    model_l, params_l, codebooks = _init(cfg)
    from vampnet_tpu.modules.lora import lora_param_filter, lora_state_dict

    filt = lora_param_filter(params_l)
    n_lora = sum(jax.tree_util.tree_leaves(filt))
    # q,v,fc + w_1,w_2 per layer, 2 params each (a,b), 2 layers
    assert n_lora == 2 * 5 * 2
    sd = lora_state_dict(params_l)
    assert len(jax.tree_util.tree_leaves(sd)) == n_lora

    # zero-init lora_b means logits match the lora-free model given same base params
    model0 = VampNetLM(TINY)
    import flax.traverse_util as tu

    base = {
        k: v for k, v in tu.flatten_dict(params_l).items() if k[-1] not in ("lora_a", "lora_b")
    }
    params0 = tu.unflatten_dict(base)
    codes = jax.random.randint(jax.random.PRNGKey(5), (1, 4, 8), 0, 32)
    l0 = model0.apply({"params": params0}, codes, codebooks, method="forward_codes")
    ll = model_l.apply({"params": params_l}, codes, codebooks, method="forward_codes")
    np.testing.assert_allclose(np.asarray(l0), np.asarray(ll), atol=1e-5)


# ---------------- torch parity ----------------


def test_relative_position_bucket_matches_reference():
    reft = pytest.importorskip("tests.reference_harness", reason="torch required")
    import torch

    mod = reft.load_reference_transformer()
    attn = mod.MultiHeadRelativeAttention(
        n_head=4, d_model=64, dropout=0.0, bidirectional=True,
        has_relative_attention_bias=True,
    )
    t = 200
    rel = torch.arange(t)[None, :] - torch.arange(t)[:, None]
    ref_buckets = attn._relative_position_bucket(rel)
    ours = relative_position_bucket(
        jnp.asarray(rel.numpy()), bidirectional=True, num_buckets=32, max_distance=128
    )
    np.testing.assert_array_equal(np.asarray(ours), ref_buckets.numpy())


def _copy_torch_to_flax(ref_model, params, cfg):
    """Map reference torch weights into our flax param tree (tiny configs)."""
    import flax.traverse_util as tu
    import torch

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    flat = dict(tu.flatten_dict(params))

    def put(path, arr):
        assert path in flat, f"missing {path}"
        assert flat[path].shape == arr.shape, f"{path}: {flat[path].shape} vs {arr.shape}"
        flat[path] = jnp.asarray(arr)

    # embedding
    put(("embedding", "special_MASK"), sd["embedding.special.MASK"])
    put(("embedding", "out_proj", "kernel"), sd["embedding.out_proj.weight"][:, :, 0].T)
    put(("embedding", "out_proj", "bias"), sd["embedding.out_proj.bias"])
    # classifier (weight-norm conv1d: collapse g*v/||v||); reference channels
    # are vocab-major, ours codebook-major (see convert.py)
    wv = sd["classifier.layers.0.weight_v"][:, :, 0]
    wg = sd["classifier.layers.0.weight_g"][:, 0, 0]
    w = wg[:, None] * wv / np.linalg.norm(wv, axis=1, keepdims=True)
    n_out, v = w.shape[0], cfg.vocab_size
    perm = (np.arange(n_out) % v) * (n_out // v) + (np.arange(n_out) // v)
    put(("classifier", "kernel"), w[perm].T)
    put(("classifier", "bias"), sd["classifier.layers.0.bias"][perm])
    # transformer layers
    for i in range(cfg.n_layers):
        p = f"transformer.layers.{i}"
        o = ("transformer", f"layers_{i}")
        put(o + ("norm_1", "weight"), sd[f"{p}.norm_1.weight"])
        put(o + ("norm_3", "weight"), sd[f"{p}.norm_3.weight"])
        for ours_n, ref_n in [("w_qs", "w_qs"), ("w_ks", "w_ks"), ("w_vs", "w_vs"), ("fc", "fc")]:
            put(o + ("self_attn", ours_n, "kernel"), sd[f"{p}.self_attn.{ref_n}.weight"].T)
        if i == 0:
            put(
                o + ("self_attn", "relative_attention_bias"),
                sd[f"{p}.self_attn.relative_attention_bias.weight"],
            )
        put(o + ("feed_forward", "w_1", "kernel"), sd[f"{p}.feed_forward.w_1.weight"].T)
        put(o + ("feed_forward", "w_2", "kernel"), sd[f"{p}.feed_forward.w_2.weight"].T)
    put(("transformer", "norm", "weight"), sd["transformer.norm.weight"])
    return tu.unflatten_dict(flat)


def test_forward_logits_match_reference_torch():
    """End-to-end forward parity: same weights + same input codes -> same logits."""
    reft = pytest.importorskip("tests.reference_harness")
    import torch

    mod = reft.load_reference_transformer()
    torch.manual_seed(0)
    cfg = LMConfig(
        n_heads=4, n_layers=2, n_codebooks=4, n_conditioning_codebooks=0,
        latent_dim=8, embedding_dim=64, vocab_size=32, dropout=0.0,
    )
    ref = mod.VampNet(
        n_heads=cfg.n_heads, n_layers=cfg.n_layers, n_codebooks=cfg.n_codebooks,
        n_conditioning_codebooks=0, latent_dim=cfg.latent_dim,
        embedding_dim=cfg.embedding_dim, vocab_size=cfg.vocab_size,
        flash_attn=False, dropout=0.0,
    ).eval()

    # a fake codec exposing quantizer codebook weights (reference layers.py:145)
    class _CB:
        def __init__(self, w):
            self.codebook = torch.nn.Embedding.from_pretrained(w)

    class _Q:
        def __init__(self, ws):
            self.quantizers = [_CB(w) for w in ws]

    class _Codec:
        def __init__(self, ws):
            self.quantizer = _Q(ws)

    torch.manual_seed(1)
    cb_t = [torch.randn(cfg.vocab_size, cfg.latent_dim) for _ in range(cfg.n_codebooks)]
    codec = _Codec(cb_t)
    codebooks = jnp.stack([jnp.asarray(w.numpy()) for w in cb_t])

    model = VampNetLM(
        LMConfig(**{**cfg.__dict__})
    )
    b, t = 2, 16
    codes_np = np.random.default_rng(0).integers(0, cfg.vocab_size, (b, cfg.n_codebooks, t))
    # include some MASK tokens
    codes_np[:, :, ::3] = cfg.mask_token

    codes_t = torch.tensor(codes_np, dtype=torch.long)
    with torch.no_grad():
        latents = ref.embedding.from_codes(codes_t, codec)
        ref_logits = ref(latents)  # (b, vocab, t*c)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(codes_np), codebooks, method="forward_codes"
    )
    # use fp32 compute for the parity check
    import dataclasses as dc

    params = _copy_torch_to_flax(ref, variables["params"], cfg)
    logits = model.apply(
        {"params": params}, jnp.asarray(codes_np), codebooks, method="forward_codes"
    )
    # ours: (b, t, c, v) -> reference layout (b, v, t*c)
    ours = np.asarray(jnp.transpose(logits.reshape(b, t * cfg.n_codebooks, cfg.vocab_size), (0, 2, 1)))
    ref_np = ref_logits.numpy()
    # bf16 matmuls vs fp32 torch: allow loose tolerance
    np.testing.assert_allclose(ours, ref_np, atol=0.15, rtol=0.1)
    # and correlation should be essentially 1
    c = np.corrcoef(ours.ravel(), ref_np.ravel())[0, 1]
    assert c > 0.999


def test_precomputed_position_bias_matches_inline():
    """forward_codes(position_bias=...) must equal the inline-computed path —
    the sampler hoists the bias out of its step loop (seq-length-only)."""
    from vampnet_tpu.modules.transformer import position_bias_from_params

    cfg = LMConfig(
        n_heads=2, n_layers=2, n_codebooks=2, latent_dim=4,
        embedding_dim=32, vocab_size=16, dropout=0.0,
    )
    model = VampNetLM(cfg)
    codes = jax.random.randint(jax.random.PRNGKey(0), (1, 2, 24), 0, 16)
    cbs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    params = model.init(jax.random.PRNGKey(2), codes, cbs, method="forward_codes")["params"]

    ref = model.apply({"params": params}, codes, cbs, method="forward_codes")
    bias = position_bias_from_params(params, cfg, 24)
    out = model.apply(
        {"params": params}, codes, cbs, method="forward_codes", position_bias=bias
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
