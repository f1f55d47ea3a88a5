"""int8 w8a8 quantization: logits fidelity + generate agreement vs bf16."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.modules.quantize import quantize_kernel, quantize_lm_params
from vampnet_tpu.sampling import build_generate_fn

CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=4, latent_dim=8,
    embedding_dim=128, vocab_size=64, dropout=0.0,
)


def _setup():
    model = VampNetLM(CFG)
    codes = jax.random.randint(jax.random.PRNGKey(2), (2, 4, 32), 0, 64)
    cbs = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 8))
    params = model.init(jax.random.PRNGKey(0), codes, cbs, method="forward_codes")["params"]
    return model, params, cbs, codes


def test_quantize_kernel_roundtrip():
    k = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_kernel(k)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    recon = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    rel = np.abs(recon - k).max() / np.abs(k).max()
    assert rel < 0.01  # per-channel symmetric int8: <1% peak error


def test_quantized_params_structure():
    _, params, _, _ = _setup()
    qparams = quantize_lm_params(params)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(qparams)
    q_leaves = [p for p in flat if p[-1] == "kernel_q"]
    assert len(q_leaves) == 2 * 6  # 2 layers x (qkv+fc+w1+w2)
    # classifier and embedding stay fp
    assert ("classifier", "kernel") in flat
    assert ("embedding", "out_proj", "kernel") in flat


def test_quantized_logits_close_to_fp():
    model, params, cbs, codes = _setup()
    ref = model.apply({"params": params}, codes, cbs, method="forward_codes")

    qcfg = dataclasses.replace(CFG, quantization="int8")
    qmodel = VampNetLM(qcfg)
    qparams = quantize_lm_params(params)
    out = qmodel.apply({"params": qparams}, codes, cbs, method="forward_codes")

    ref_np, out_np = np.asarray(ref), np.asarray(out)
    corr = np.corrcoef(ref_np.ravel(), out_np.ravel())[0, 1]
    assert corr > 0.99, f"logit correlation {corr}"
    # greedy tokens mostly agree
    agree = (ref_np.argmax(-1) == out_np.argmax(-1)).mean()
    assert agree > 0.9, f"greedy agreement {agree}"


def test_quantized_generate_runs():
    model, params, cbs, codes = _setup()
    qcfg = dataclasses.replace(CFG, quantization="int8")
    qmodel = VampNetLM(qcfg)
    qparams = quantize_lm_params(params)
    gen = build_generate_fn(qmodel, sampling_steps=3)
    mask = jnp.ones_like(codes)
    out = np.asarray(
        gen(qparams, cbs, jax.random.PRNGKey(0), codes, mask, 1.0, 10.5, 0.0, 1.0)
    )
    assert out.shape == codes.shape
    assert (out >= 0).all() and (out < CFG.vocab_size).all()
