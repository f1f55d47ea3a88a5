"""Ring attention (sequence-parallel over the virtual 8-device CPU mesh) vs
the single-device reference paths — VERDICT.md round-1 item 8."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.modules.transformer import relative_position_bucket
from vampnet_tpu.ops.attention import dot_product_attention
from vampnet_tpu.ops.ring_attention import ring_attention


def _mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


def _full_bias(table, t, num_buckets=32, max_distance=128):
    rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional=True, num_buckets=num_buckets, max_distance=max_distance
    )
    return jnp.transpose(table[buckets], (2, 0, 1))  # (h, t, t)


@pytest.mark.parametrize("t", [1024, 4096])
def test_ring_attention_matches_single_device(t):
    b, h, d = 1, 4, 64
    if t == 4096 and len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kt = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, t, h, d), jnp.float32) * 0.5
    k = jax.random.normal(kk, (b, t, h, d), jnp.float32) * 0.5
    v = jax.random.normal(kv, (b, t, h, d), jnp.float32)
    table = jax.random.normal(kt, (32, h), jnp.float32)

    ref = dot_product_attention(q, k, v, bias=_full_bias(table, t), impl="xla")

    mesh = _mesh()
    fn = jax.shard_map(
        lambda q, k, v, tbl: ring_attention(
            q, k, v, tbl, "sp", bucket_fn=relative_position_bucket
        ),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P()),
        out_specs=P(None, "sp"),
    )
    out = fn(q, k, v, table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-2)


def test_ring_attention_no_bias():
    b, t, h, d = 2, 512, 2, 32
    q = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d)) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d)) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, d))
    ref = dot_product_attention(q, k, v, bias=None, impl="xla")
    fn = jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, None, "sp"),
        mesh=_mesh(),
        in_specs=(P(None, "sp"),) * 3,
        out_specs=P(None, "sp"),
    )
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-2)


def test_lm_forward_with_ring_attention():
    """Full tiny LM under shard_map with the time axis sharded over 'sp':
    attention_impl='ring' logits == the single-device xla-attention logits.
    Everything else in the stack is position-wise, so sequence sharding
    composes with the whole forward."""
    t = 256
    cfg = LMConfig(
        n_heads=2, n_layers=2, n_codebooks=2, latent_dim=4, embedding_dim=32,
        vocab_size=32, dropout=0.0, attention_impl="xla",
    )
    import dataclasses

    model = VampNetLM(cfg)
    codes = jax.random.randint(jax.random.PRNGKey(5), (1, 2, t), 0, 32)
    cbs = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 4))
    params = model.init(
        jax.random.PRNGKey(0), codes, cbs, method="forward_codes"
    )["params"]
    ref = model.apply({"params": params}, codes, cbs, method="forward_codes")

    ring_model = VampNetLM(dataclasses.replace(cfg, attention_impl="ring"))
    fn = jax.shard_map(
        lambda p, c, cb: ring_model.apply(
            {"params": p}, c, cb, method="forward_codes"
        ),
        mesh=_mesh(),
        in_specs=(P(), P(None, None, "sp"), P()),
        out_specs=P(None, "sp"),
    )
    out = fn(params, codes, cbs)
    assert out.shape == ref.shape
    # ring accumulates the softmax/V product in fp32 while the xla path does
    # the probs @ V matmul in bf16, so tolerances reflect bf16 noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=6e-2, rtol=5e-2)
    c = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.9999
