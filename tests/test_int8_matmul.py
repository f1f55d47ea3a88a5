"""Fused w8a8 Pallas kernel vs the XLA reference path (interpret mode on
CPU). Integer accumulation is exact, so the two paths must agree to float
rounding of the final dequant multiply."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.modules.quantize import quantize_kernel
from vampnet_tpu.ops.int8_matmul import w8a8_matmul


@pytest.mark.parametrize("m,k,n", [(64, 128, 128), (96, 256, 384), (300, 640, 1280)])
def test_pallas_matches_xla(m, k, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
    wq, ws = quantize_kernel(w)

    ref = w8a8_matmul(x, wq, ws, out_dtype=jnp.float32, impl="xla")
    out = w8a8_matmul(
        x, wq, ws, out_dtype=jnp.float32, impl="pallas", interpret=True,
        block_m=128, block_n=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_batched_input_and_bf16_out():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 33, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 128), jnp.float32) * 0.05
    wq, ws = quantize_kernel(w)
    ref = w8a8_matmul(x, wq, ws, out_dtype=jnp.bfloat16, impl="xla")
    out = w8a8_matmul(x, wq, ws, out_dtype=jnp.bfloat16, impl="pallas",
                      interpret=True, block_m=64, block_n=128)
    assert out.shape == (2, 33, 128) and out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )


def test_quantized_dense_accuracy():
    """End-to-end: quantized LoRADense correlates with the fp layer."""
    import flax.linen as nn

    from vampnet_tpu.modules.lora import LoRADense
    from vampnet_tpu.modules.quantize import quantize_lm_params

    d_in, d_out = 256, 512
    layer = LoRADense(d_out, dtype=jnp.float32, quantize=False, name="w_1")
    x = jax.random.normal(jax.random.PRNGKey(4), (8, d_in), jnp.float32)
    params = layer.init(jax.random.PRNGKey(5), x)["params"]
    y_fp = layer.apply({"params": params}, x)

    qparams = quantize_lm_params({"w_1": params})["w_1"]
    qlayer = LoRADense(d_out, dtype=jnp.float32, quantize=True, name="w_1")
    y_q = qlayer.apply({"params": qparams}, x)
    c = np.corrcoef(np.asarray(y_fp).ravel(), np.asarray(y_q).ravel())[0, 1]
    assert c > 0.999
