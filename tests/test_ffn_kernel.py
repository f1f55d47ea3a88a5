"""Fused GEGLU FFN Pallas kernel (ops/ffn_kernel.py) — parity vs the XLA
path, in interpret mode on CPU. The kernel fuses RMSNorm + w_1 + GEGLU +
w_2 + residual (reference FeedForward, vampnet/modules/transformer.py:61-85)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.modules.transformer import TransformerLayer
from vampnet_tpu.ops.ffn_kernel import fused_geglu_ffn


def _ref_ffn(x, nw, w1, w2, eps=1e-6):
    """The XLA path: RMSNorm -> GEGLU FFN -> residual, bf16 between ops."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (nw * (xf * jax.lax.rsqrt(var + eps))).astype(x.dtype)
    h = jnp.dot(y, w1.astype(x.dtype))
    p1, p2 = jnp.split(h, 2, axis=-1)
    g = p1 * jax.nn.gelu(p2, approximate=True)
    return x + jnp.dot(g, w2.astype(x.dtype))


@pytest.mark.parametrize(
    "b,t,d,block_m,block_f",
    [
        (2, 16, 64, 8, 32),     # clean tiling
        (1, 25, 64, 8, 48),     # m and f both ragged -> padded
        (3, 10, 96, 16, 96),    # single f block
    ],
)
def test_fused_ffn_matches_xla_path(b, t, d, block_m, block_f):
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    x = jax.random.normal(k1, (b, t, d), jnp.bfloat16)
    nw = 1.0 + 0.1 * jax.random.normal(k2, (d,), jnp.float32)
    w1 = jax.random.normal(k3, (d, 4 * d), jnp.float32) / np.sqrt(d)
    w2 = jax.random.normal(k4, (2 * d, d), jnp.float32) / np.sqrt(2 * d)

    got = fused_geglu_ffn(x, nw, w1, w2, block_m=block_m, block_f=block_f,
                          interpret=True)
    want = _ref_ffn(x, nw, w1, w2)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_ffn_fp32_inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 12, 64), jnp.float32)
    nw = jnp.ones((64,), jnp.float32)
    w1 = jax.random.normal(k2, (64, 256), jnp.float32) / 8
    w2 = jax.random.normal(k1, (128, 64), jnp.float32) / 11
    got = fused_geglu_ffn(x, nw, w1, w2, block_m=8, block_f=64, interpret=True)
    want = _ref_ffn(x, nw, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_layer_fused_ffn_impl_matches_xla():
    """TransformerLayer(ffn_impl='fused') applies the kernel on the SAME param
    tree the xla path initializes — outputs match to bf16 tolerance."""
    kw = dict(n_heads=2, dropout=0.0, attention_impl="xla")
    layer_xla = TransformerLayer(ffn_impl="xla", **kw)
    layer_fused = TransformerLayer(ffn_impl="fused", **kw)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 64), jnp.bfloat16)
    params = layer_xla.init(jax.random.PRNGKey(0), x)["params"]

    out_xla, _ = layer_xla.apply({"params": params}, x)
    out_fused, _ = layer_fused.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_xla, np.float32), np.asarray(out_fused, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_model_fused_ffn_logits_close():
    """Full VampNetLM forward with ffn_impl='fused' reuses the default tree."""
    cfg = LMConfig(n_heads=2, n_layers=2, n_codebooks=2, latent_dim=4,
                   embedding_dim=64, vocab_size=32, dropout=0.0)
    cfg_fused = LMConfig(n_heads=2, n_layers=2, n_codebooks=2, latent_dim=4,
                         embedding_dim=64, vocab_size=32, dropout=0.0,
                         ffn_impl="fused")
    model = VampNetLM(cfg)
    model_fused = VampNetLM(cfg_fused)
    codes = jax.random.randint(jax.random.PRNGKey(3), (2, 2, 16), 0, 32)
    cbs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 4))
    params = model.init(jax.random.PRNGKey(0), codes, cbs,
                        method="forward_codes")["params"]
    lx = model.apply({"params": params}, codes, cbs, method="forward_codes")
    lf = model_fused.apply({"params": params}, codes, cbs, method="forward_codes")
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=4e-2, atol=4e-2)


def test_fused_ffn_training_path_unaffected():
    """deterministic=False (training) must NOT take the fused path even with
    ffn_impl='auto' — dropout and LoRA live on the XLA path only."""
    layer = TransformerLayer(n_heads=2, dropout=0.5, ffn_impl="auto",
                             attention_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 64), jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    out, _ = layer.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == x.shape  # would crash in the kernel if fused ran
