"""Round-5 probe: why does the remote-compile service 413 the chained
stage loops (bench.make_stage_loops) when the much larger vamp_e2e program
compiles fine?

Lowers (AOT, for TPU, from a CPU host — no device needed) the coarse
generate program and its chained fori_loop wrapper at full bench scale and
prints the StableHLO module sizes. If chaining inflates the module far past
the plain program, the payload limit explains the r4/r5 chained-compile
failures (413 / broken pipe) and the fix is to shrink the chained module.

Run: python scratch/probe_payload_size.py   (CPU, ~1 min)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench


def module_sizes(lowered, label):
    text = lowered.as_text()
    try:
        from jax._src.interpreters import mlir as jmlir

        bc = len(jmlir.module_to_bytecode(lowered.compiler_ir("stablehlo")))
    except Exception:
        bc = -1
    print(f"{label}: as_text={len(text) / 2**20:.1f} MB "
          f"bytecode={bc / 2**20:.1f} MB")
    return text


def main():
    codec_cfg, iface = bench.build_iface()
    lm = iface.coarse
    t_len = iface.s2t(lm.chunk_size_s)
    nb = 2
    z = jnp.zeros((nb, lm.n_codebooks, t_len), jnp.int32)
    m = jnp.ones_like(z)
    key = jax.random.PRNGKey(0)

    gen = iface._gen_fn(
        "coarse", lm, sampling_steps=12, typical_filtering=True,
        typical_mass=0.15, typical_min_tokens=64, top_k=None,
        use_top_p=False, cfg_guidance=None, sampler_impl="auto",
    )
    cbs = iface._codebooks[: lm.n_codebooks]
    f32 = jnp.float32
    args = (lm.params, cbs, key, z, m, f32(1.0), f32(10.5), f32(0.0), f32(1.0))

    lowered = gen.trace(*args).lower(lowering_platforms=("tpu",))
    module_sizes(lowered, "plain coarse generate (b=2, t=861)")

    @jax.jit
    def run_explicit(params, cbs, z, key, iters):
        def body(i, zz):
            return gen(
                params, cbs, jax.random.fold_in(key, i),
                jnp.where(m.astype(bool), lm.mask_token, zz), m,
                f32(1.0), f32(10.5), f32(0.0), f32(1.0),
            )

        return jax.lax.fori_loop(0, iters, body, z).sum()

    lowered2 = run_explicit.trace(
        lm.params, cbs, z, key, jnp.int32(1)
    ).lower(lowering_platforms=("tpu",))
    module_sizes(lowered2, "chained coarse loop, params explicit")

    # the shipped make_stage_loops form: params closed over
    @jax.jit
    def run_closed(z, key, iters):
        def body(i, zz):
            return iface._run_generate(
                lm, jnp.where(m.astype(bool), lm.mask_token, zz), m,
                jax.random.fold_in(key, i), _sampling_steps=12,
            )

        return jax.lax.fori_loop(0, iters, body, z).sum()

    lowered3 = run_closed.trace(z, key, jnp.int32(1)).lower(
        lowering_platforms=("tpu",)
    )
    module_sizes(lowered3, "chained coarse loop, params closed over")


if __name__ == "__main__":
    main()
