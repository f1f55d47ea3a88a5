"""Pallas fused-attention kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU compiled path is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.ops.attention import dot_product_attention
from vampnet_tpu.ops.flash_attention import flash_attention_with_bias


def _inputs(b=2, t=100, h=4, d=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, t, h, d), dtype)
    k = jax.random.normal(ks[1], (b, t, h, d), dtype)
    v = jax.random.normal(ks[2], (b, t, h, d), dtype)
    bias = jax.random.normal(ks[3], (h, t, t), jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize("t", [100, 128, 262])
def test_matches_xla_with_bias(t):
    q, k, v, bias = _inputs(t=t)
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = flash_attention_with_bias(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_matches_xla_no_bias():
    q, k, v, _ = _inputs(t=96)
    ref = dot_product_attention(q, k, v, impl="xla")
    out = flash_attention_with_bias(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_matches_xla_with_mask():
    q, k, v, bias = _inputs(t=64)
    mask = jnp.ones((2, 64, 64), jnp.int32).at[:, :, 40:].set(0)
    ref = dot_product_attention(q, k, v, bias=bias, mask=mask, impl="xla")
    out = flash_attention_with_bias(q, k, v, bias=bias, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_bf16_inputs():
    q, k, v, bias = _inputs(t=128, dtype=jnp.bfloat16)
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = flash_attention_with_bias(q, k, v, bias=bias, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_padding_does_not_leak():
    # t=100 pads to 128 keys inside the kernel; padded keys must not receive
    # attention mass
    q, k, v, bias = _inputs(t=100)
    out1 = flash_attention_with_bias(q, k, v, bias=bias, interpret=True)
    # change values beyond t (simulated by growing inputs with huge values)
    q2 = jnp.concatenate([q, 100 * jnp.ones((2, 28, 4, 64))], axis=1)[:, :100]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(
        flash_attention_with_bias(q2, k, v, bias=bias, interpret=True)
    ), atol=1e-6)


@pytest.mark.parametrize("t", [1500, 2048])
def test_blocked_long_sequence_matches_xla(t):
    # t > MAX_SINGLE_PASS_SEQ triggers the online-softmax blocked kernel
    q, k, v, bias = _inputs(b=1, t=t, h=2, d=64)
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = flash_attention_with_bias(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_blocked_with_mask():
    t = 1200
    q, k, v, bias = _inputs(b=1, t=t, h=2, d=64)
    mask = jnp.ones((1, t, t), jnp.int32).at[:, :, 900:].set(0)
    ref = dot_product_attention(q, k, v, bias=bias, mask=mask, impl="xla")
    out = flash_attention_with_bias(q, k, v, bias=bias, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-4)


def _grad_check(bias=None, mask=None, t=100, dtype=jnp.float32, atol=2e-3):
    b, h, d = 2, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, t, h, d), dtype)
    k = jax.random.normal(ks[1], (b, t, h, d), dtype)
    v = jax.random.normal(ks[2], (b, t, h, d), dtype)

    def loss_pallas(q, k, v, bias):
        out = flash_attention_with_bias(q, k, v, bias=bias, mask=mask, interpret=True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_xla(q, k, v, bias):
        out = dot_product_attention(q, k, v, bias=bias, mask=mask, impl="xla")
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    args = (q, k, v, bias)
    argnums = (0, 1, 2) if bias is None else (0, 1, 2, 3)
    g_p = jax.grad(loss_pallas, argnums)(*args)
    g_x = jax.grad(loss_xla, argnums)(*args)
    for gp, gx, name in zip(g_p, g_x, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gx, np.float32),
            atol=atol, rtol=1e-2, err_msg=name,
        )


def test_vjp_matches_xla_grads_no_bias():
    _grad_check(bias=None)


def test_vjp_matches_xla_grads_with_bias():
    bias = jax.random.normal(jax.random.PRNGKey(9), (4, 100, 100), jnp.float32)
    _grad_check(bias=bias)


def test_vjp_matches_xla_grads_with_mask():
    bias = jax.random.normal(jax.random.PRNGKey(9), (4, 64, 64), jnp.float32)
    mask = jnp.ones((2, 64, 64), jnp.int32).at[:, :, 40:].set(0)
    _grad_check(bias=bias, mask=mask, t=64)


def test_vjp_multi_qblock_split_backward():
    """Force n_qb > 1 through the split shared-bias backward: the dslice
    dbias accumulation across (batch, q_block) revisits and the dk/dv
    accumulation across q blocks are otherwise untested (the adaptive
    default makes every small-t test whole-sequence single-block)."""
    bias = jax.random.normal(jax.random.PRNGKey(9), (4, 100, 100), jnp.float32)
    b, h, d, t = 2, 4, 64, 100
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, t, h, d))
    v = jax.random.normal(ks[2], (b, t, h, d))

    def loss(block_q):
        def f(q, k, v, bias):
            out = flash_attention_with_bias(
                q, k, v, bias=bias, block_q=block_q, interpret=True
            )
            return jnp.sum(jnp.sin(out.astype(jnp.float32)))
        return f

    g_multi = jax.grad(loss(64), (0, 1, 2, 3))(q, k, v, bias)  # tp=128, n_qb=2
    g_whole = jax.grad(loss(None), (0, 1, 2, 3))(q, k, v, bias)
    for gm, gw, name in zip(g_multi, g_whole, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gw), atol=2e-3, rtol=1e-2, err_msg=name
        )


def test_inference_primal_uses_dt_kernel_and_matches_grad_path():
    """Round-4/5 dispatch contract: whole-seq shared-bias calls take the
    (d,t)-major kernel on the custom_vjp primal (inference — clear measured
    win); the VJP forward (training) keeps (t,d) BY DEFAULT (round-5: two
    same-process step sandwiches read the dt training fwd ~1% slower, see
    docs/PERF.md "Round-5") and rides the dt fwd+lse variant only under
    VAMPNET_DT_TRAIN_FWD=1. The backward always keeps (t,d). Pin (a) the
    dispatch counts on every path in both flag states, and (b) primal
    output == differentiated-path forward output in both (same math,
    layout-only change; fp32 whole-seq is bit-stable in interpret mode up
    to accumulation order)."""
    from vampnet_tpu.ops import flash_attention as fa

    q, k, v, bias = _inputs(t=100)
    calls = {"dt": 0}
    orig = fa._fwd_call_dt

    def counting(*a, **kw):
        calls["dt"] += 1
        return orig(*a, **kw)

    grad_fn = lambda q, k, v, b: flash_attention_with_bias(
        q, k, v, bias=b, interpret=True
    )

    fa._fwd_call_dt = counting
    orig_flag = fa._DT_TRAIN_FWD
    try:
        out_inf = flash_attention_with_bias(q, k, v, bias=bias, interpret=True)
        assert calls["dt"] == 1, "whole-seq shared-bias primal must take dt"

        # default: the differentiated-path forward stays on (t,d)
        fa._DT_TRAIN_FWD = False
        out_grad, _ = jax.vjp(grad_fn, q, k, v, bias)
        assert calls["dt"] == 1, "grad path must NOT take dt by default"
        np.testing.assert_allclose(
            np.asarray(out_inf), np.asarray(out_grad), atol=2e-6, rtol=1e-5
        )

        # opt-in: VAMPNET_DT_TRAIN_FWD=1 routes the fwd+lse variant to dt
        fa._DT_TRAIN_FWD = True
        out_grad_dt, _ = jax.vjp(grad_fn, q, k, v, bias)
        assert calls["dt"] == 2, "opt-in grad path must take the dt fwd+lse"
        np.testing.assert_allclose(
            np.asarray(out_inf), np.asarray(out_grad_dt), atol=2e-6, rtol=1e-5
        )

        # a masked call (per-row bias, 128-row blocks) must NOT take dt,
        # on either the primal or the grad path, in either flag state
        mask = jnp.ones((q.shape[0], q.shape[1], q.shape[1]), jnp.int32)
        for flag in (False, True):
            fa._DT_TRAIN_FWD = flag
            flash_attention_with_bias(
                q, k, v, bias=bias, mask=mask, interpret=True
            )
            jax.vjp(
                lambda q, k, v, b: flash_attention_with_bias(
                    q, k, v, bias=b, mask=mask, interpret=True
                ),
                q, k, v, bias,
            )
        assert calls["dt"] == 2
    finally:
        fa._fwd_call_dt = orig
        fa._DT_TRAIN_FWD = orig_flag


def test_dt_fwd_lse_matches_td_fwd_lse():
    """The (d,t) fwd+lse kernel must reproduce the (t,d) kernel's output AND
    saved lse (the backward consumes lse; a drifting lse silently corrupts
    every gradient). Compared via the internal padded-call API at a
    non-multiple-of-128 t so the key-pad handling is exercised."""
    from vampnet_tpu.ops import flash_attention as fa

    q, k, v, bias = _inputs(t=100)
    b, t, h, d = q.shape
    qs = (q.astype(jnp.float32) * (fa.LOG2E / (d ** 0.5))).astype(q.dtype)
    tp = fa._round_up(t, 128)
    dp = fa._round_up(d, 128)

    def pad_qkv(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, dp - d)))

    qp, kp, vp = pad_qkv(qs), pad_qkv(k), pad_qkv(v)
    bias_p = jnp.pad(
        bias.astype(jnp.float32) * fa.LOG2E, ((0, 0), (0, tp - t), (0, tp - t))
    )
    bias_p = jnp.where((jnp.arange(tp) >= t)[None, None, :], -1e9, bias_p)

    out_td, lse_td = fa._fwd_call(
        qp, kp, vp, bias_p, tp, h, True, with_lse=True
    )
    out_dt, lse_dt = fa._fwd_call_dt(
        qp, kp, vp, bias_p, h, d, True, with_lse=True
    )
    np.testing.assert_allclose(
        np.asarray(out_td[:, :t, :d]), np.asarray(out_dt[:, :t, :d]),
        atol=2e-6, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lse_td[:, 0, :t]), np.asarray(lse_dt[:, 0, :t]),
        atol=2e-5, rtol=1e-6,
    )
