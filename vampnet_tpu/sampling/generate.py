"""MaskGIT-style iterative parallel decoding, fully on-device.

Reimplements reference VampNet.generate (vampnet/modules/transformer.py:686-946)
as a single jit-compiled function: the sampling loop is a `lax.fori_loop`, so
there is no host round-trip per step (the reference's Python `for` loop and its
per-step host<->device syncs are the main inefficiency this rebuild removes —
SURVEY.md §3.1).

Semantics match the reference step for step:
  r = (i+1)/steps; forward; sample with typical/top-k/top-p filters;
  keep unmasked tokens; num_to_mask = floor(gamma(r) * N0); clamp to
  [1, remaining-1] except on the last step; gumbel-confidence re-mask with
  temperature mask_temperature*(1-r).

  One deliberate divergence: N0 is counted PER ROW, where the reference sums
  over the whole batch (reference :766). The reference runs chunks serially
  (batch is just "variations"), so its scalar N0 is per-chunk in practice;
  this implementation maps chunks to batch rows, and a batch-summed N0 would
  collapse the schedule (see inline comment).

Classifier-free guidance:
  * ctrls CFG (reference :722-733): cond/uncond halves are batched through the
    forward and combined as uncond + scale*(cond-uncond). Unlike the reference
    (which only works for batch=1 due to a broadcasting accident), this
    implementation supports any batch size.
  * cfg_guidance (reference :771-783,:845-847): the reference computes the
    guided logits but drops them on the floor (logits_cond is never written
    back); here the guided logits are actually used.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..mask import _gamma
from ..util import codebook_flatten, codebook_unflatten
from .sample import (
    fold_in_rows,
    keys_are_batched,
    mask_by_random_topk,
    sample_from_logits,
)


def generate(
    forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    start_tokens: jnp.ndarray,  # (b, n_codebooks, t) int
    mask: Optional[jnp.ndarray],  # (b, n_codebooks, t) or (b, t); 1 = regenerate
    mask_token: int,
    n_conditioning_codebooks: int = 0,
    sampling_steps: int = 12,
    temperature=1.0,
    mask_temperature=10.5,
    typical_filtering: bool = True,
    typical_mass: float = 0.15,
    typical_min_tokens: int = 64,
    top_k: Optional[int] = None,
    top_p=None,
    sample_cutoff: float = 1.0,
    cfg_guidance: Optional[float] = None,
    ctrls=None,
    ctrl_masks=None,
    cfg_scale: float = 3.0,
    sampler_impl: str = "auto",  # auto | xla | fused (Pallas, TPU only)
    debug_callback=None,
) -> jnp.ndarray:
    """Run the MaskGIT loop; returns sampled codes (b, n_codebooks, t).

    `forward_fn` maps masked codes (b, C, T) [+ optional ctrls/ctrl_masks]
    -> logits (b, T, C_infer, V) in fp32 (already bound to params + codec
    codebooks). Static arguments (sampling_steps, filter structure) specialize
    the trace; `temperature`, `mask_temperature`, `top_p`, `sample_cutoff`
    may be traced scalars or per-row (b,) arrays. With `ctrls`, every forward
    runs conditioned+unconditioned halves and applies CFG with `cfg_scale`
    (reference transformer.py:722-733).

    `key` may be a single PRNG key (one noise stream for the whole batch —
    the reference's semantics) or a batch of per-row keys ((b,) typed or
    (b, 2) raw): then every random draw is vmapped per row, so a row's output
    depends only on its own key/logits, never on batch-mates. This is what
    gives the serving engine solo == batched determinism per request.
    """
    z = start_tokens.astype(jnp.int32)
    nb, n_cb, t = z.shape
    ncc = n_conditioning_codebooks
    n_infer = n_cb - ncc
    flat_len = t * n_infer

    if mask is None:
        mask = jnp.ones_like(z)
        mask = mask.at[:, :ncc, :].set(0) if ncc else mask
    if mask.ndim == 2:
        mask = jnp.broadcast_to(mask[:, None, :], z.shape)
    mask = mask.astype(jnp.int32)

    z_masked = jnp.where(mask.astype(bool), mask_token, z)
    # Per-ROW count, deliberately diverging from the reference's whole-batch
    # scalar (reference :766): the interface turns serial chunks into batch
    # rows, so a batch-summed N0 would make per-row floor(gamma(r)*N0)
    # saturate the remaining-1 clamp and collapse the MaskGIT schedule to
    # ~2-4 effective steps for any multi-chunk input. Counting per row gives
    # each chunk-row exactly the reference's per-chunk schedule.
    num_mask_tokens_at_start = jnp.sum(z_masked == mask_token, axis=(1, 2))

    if cfg_guidance is not None:
        # append fully-masked unconditional rows (reference :771-783)
        z_uncond = jnp.full_like(z, mask_token)
        z_masked = jnp.concatenate([z_masked, z_uncond], axis=0)
        z = jnp.concatenate([z, z_uncond], axis=0)
        num_mask_tokens_at_start = jnp.concatenate(
            [num_mask_tokens_at_start,
             jnp.full((nb,), n_cb * t, num_mask_tokens_at_start.dtype)]
        )

    b = z_masked.shape[0]

    def _per_row(p):
        """Promote a sampling param to align with the (possibly CFG-doubled)
        batch: per-row (nb,) arrays are tiled for the appended uncond rows."""
        p = jnp.asarray(p, dtype=jnp.float32)
        if cfg_guidance is not None and p.ndim == 1:
            p = jnp.concatenate([p, p], axis=0)
        return p

    temperature = _per_row(temperature)
    mask_temp = _per_row(mask_temperature)
    sample_cutoff = _per_row(sample_cutoff)
    if top_p is not None:
        top_p = _per_row(top_p)
    steps = int(sampling_steps)

    row_keys = None
    if keys_are_batched(key):
        row_keys = key
        if cfg_guidance is not None:
            # distinct streams for the appended unconditional rows
            row_keys = jnp.concatenate(
                [row_keys, fold_in_rows(row_keys, 0x756E63)], axis=0
            )
        key = jax.random.PRNGKey(0)  # unused carry placeholder

    # fused Pallas sampler (ops/sampler_kernel.py): 4.4x faster per step on
    # TPU (0.23 vs 1.03 ms at coarse shapes) with its OWN deterministic
    # stream (pltpu PRNG != threefry), so tokens differ from the xla path
    if sampler_impl == "auto":
        sampler_impl = (
            "fused"
            if jax.default_backend() == "tpu" and top_k is None
            else "xla"
        )
    if sampler_impl == "fused":
        assert top_k is None, "fused sampler does not implement top_k"
        base = row_keys if row_keys is not None else jax.vmap(
            lambda r: jax.random.fold_in(key, r)
        )(jnp.arange(b))
        fused_keys_u32 = (
            jax.random.key_data(base)
            if jnp.issubdtype(base.dtype, jax.dtypes.prng_key)
            else base
        ).astype(jnp.uint32)

    def body(i, carry):
        z_masked, sampled_flat, key = carry
        if row_keys is None:
            key, k_sample, k_mask = jax.random.split(key, 3)
        else:
            k_step = fold_in_rows(row_keys, i)
            k_sample = fold_in_rows(k_step, 0)
            k_mask = fold_in_rows(k_step, 1)
        r_scalar = (i + 1).astype(jnp.float32) / steps
        r = jnp.full((b,), r_scalar)

        if ctrls is not None:
            # ctrls CFG: batch cond (real ctrl masks) + uncond (blank masks)
            z2 = jnp.concatenate([z_masked, z_masked], axis=0)
            cm2 = {
                k: jnp.concatenate([v, jnp.zeros_like(v)], axis=0)
                for k, v in ctrl_masks.items()
            }
            c2 = {k: jnp.concatenate([v, v], axis=0) for k, v in ctrls.items()}
            both = forward_fn(z2, c2, cm2)
            cond, uncond = both[:b], both[b:]
            logits = uncond + cfg_scale * (cond - uncond)
        else:
            logits = forward_fn(z_masked)  # (b, T, n_infer, V) fp32
        if cfg_guidance is not None:
            # standard CFG on logits: uncond + g*(cond - uncond). The
            # reference wrote g*cond + g*(1-uncond) and then discarded it
            # (transformer.py:845-847) — that expression reduces after
            # softmax to a prior-free likelihood ratio, so the intended
            # formula is used here instead.
            cond, uncond = logits[:nb], logits[nb:]
            guided = uncond + cfg_guidance * (cond - uncond)
            logits = jnp.concatenate([guided, uncond], axis=0)
        v = logits.shape[-1]
        logits_flat = logits.reshape(b, flat_len, v)

        do_sample = (i.astype(jnp.float32) / steps) <= jnp.asarray(
            sample_cutoff, dtype=jnp.float32
        )
        if sampler_impl == "fused":
            from ..ops.sampler_kernel import fused_sample_from_logits

            sampled, selected_probs = fused_sample_from_logits(
                fused_keys_u32, i, logits_flat,
                temperature, do_sample, top_p=top_p,
                typical_filtering=typical_filtering,
                typical_mass=float(typical_mass),
                typical_min_tokens=int(typical_min_tokens),
                use_top_p=top_p is not None,
            )
        else:
            sampled, selected_probs = sample_from_logits(
                k_sample,
                logits_flat,
                sample=do_sample,
                temperature=temperature,
                typical_filtering=typical_filtering,
                typical_mass=typical_mass,
                typical_min_tokens=typical_min_tokens,
                top_k=top_k,
                top_p=top_p,
                return_probs=True,
            )

        zm_flat = codebook_flatten(z_masked[:, ncc:, :])
        cur_mask = zm_flat == mask_token
        sampled = jnp.where(cur_mask, sampled, zm_flat)
        selected_probs = jnp.where(cur_mask, selected_probs, jnp.inf)

        num_to_mask = jnp.floor(
            _gamma(r) * num_mask_tokens_at_start
        ).astype(jnp.int32)[:, None]
        remaining = jnp.sum(cur_mask.astype(jnp.int32), axis=-1, keepdims=True)
        clamped = jnp.maximum(1, jnp.minimum(remaining - 1, num_to_mask))
        num_to_mask = jnp.where(i != steps - 1, clamped, num_to_mask)

        new_mask = mask_by_random_topk(
            k_mask, num_to_mask, selected_probs, mask_temp * (1 - r)
        )
        z_masked_flat = jnp.where(new_mask, mask_token, sampled)
        z_masked_new = jnp.concatenate(
            [z[:, :ncc, :], codebook_unflatten(z_masked_flat, n_infer)], axis=1
        )
        if debug_callback is not None:
            # per-step host dump (reference transformer.py:824-889 debug mode);
            # also the observation point for the lockstep parity test against
            # the running torch reference (tests/test_lockstep_generate.py)
            jax.debug.callback(
                debug_callback, i,
                z_masked_new,
                codebook_unflatten(sampled, n_infer),
                codebook_unflatten(new_mask.astype(jnp.int32), n_infer),
                selected_probs,
                num_to_mask[:, 0],
            )
        return z_masked_new, sampled, key

    sampled0 = codebook_flatten(z_masked[:, ncc:, :])
    z_masked, sampled_flat, _ = jax.lax.fori_loop(
        0, steps, body, (z_masked, sampled0, key)
    )

    out = jnp.concatenate(
        [z[:, :ncc, :], codebook_unflatten(sampled_flat, n_infer)], axis=1
    )
    if cfg_guidance is not None:
        out = out[:nb]
    return out


def build_generate_fn(
    model,
    sampling_steps: int = 12,
    typical_filtering: bool = True,
    typical_mass: float = 0.15,
    typical_min_tokens: int = 64,
    top_k: Optional[int] = None,
    use_top_p: bool = False,
    cfg_guidance: Optional[float] = None,
    sampler_impl: str = "auto",
    sp_mesh=None,
    donate: bool = True,
) -> Callable:
    """Build a jitted generate for a VampNetLM `model`.

    Returns fn(params, codebooks, key, start_tokens, mask, temperature,
    mask_temperature, top_p, sample_cutoff) -> codes. One compilation per
    (batch, seq) shape; all sampling hyperparameters that users sweep at
    request time (temperature, mask_temperature, top_p, sample_cutoff) are
    traced so sweeps don't recompile (BASELINE.json config 3).

    With `sp_mesh` (a ("sp",) mesh; requires attention_impl="ring"), the
    forward runs under shard_map with the TIME axis sharded over the mesh —
    chunk-free long context where k/v shards ride the ICI ring
    (ops/ring_attention.py) and the full (t, t) score matrix never exists.
    The sampling ops around the forward stay in plain jit: they are
    position-wise except the confidence sort, which GSPMD gathers (t*c fp32
    per row — trivial traffic next to attention).
    """
    ncc = model.config.n_conditioning_codebooks
    if sp_mesh is not None:
        assert model.config.attention_impl == "ring", (
            "sp_mesh requires attention_impl='ring'"
        )

    @functools.partial(jax.jit, static_argnames=())
    def fn(params, codebooks, key, start_tokens, mask, temperature,
           mask_temperature, top_p, sample_cutoff, ctrls=None, ctrl_masks=None,
           cfg_scale=3.0):
        # T5 bias depends only on seq length: build it ONCE here, not once
        # per MaskGIT step inside the fori_loop (~2 ms/step at coarse shapes).
        # The ring path never materializes the (t, t) bias — layer 0's bucket
        # TABLE is what rides shard_map (ops/ring_attention.py bias_block).
        bias = None
        if model.config.attention_impl != "ring":
            from ..modules.transformer import position_bias_from_params

            bias = position_bias_from_params(
                params, model.config, start_tokens.shape[-1]
            )
            # the sampling loop re-reads this (h, t, t) bias 20 layers x
            # n_steps times; in bf16 compute, carrying it at bf16 halves
            # that HBM traffic (the kernel adds it into fp32 scores either
            # way — ~0.01 logit rounding on O(1) bias values)
            if model.config.dtype == jnp.bfloat16:
                bias = bias.astype(jnp.bfloat16)

        if sp_mesh is not None:
            from jax.sharding import PartitionSpec as P

            def forward(z_masked, c=None, cm=None):
                assert c is None, "ctrls are not supported under sp sharding"

                def inner(p, z, cb):
                    return model.apply(
                        {"params": p}, z, cb, method="forward_codes"
                    )

                return jax.shard_map(
                    inner,
                    mesh=sp_mesh,
                    in_specs=(P(), P(None, None, "sp"), P()),
                    out_specs=P(None, "sp"),
                )(params, z_masked, codebooks)
        else:
            def forward(z_masked, c=None, cm=None):
                return model.apply(
                    {"params": params}, z_masked, codebooks, c, cm,
                    method="forward_codes", position_bias=bias,
                )

        return generate(
            forward,
            key,
            start_tokens,
            mask,
            mask_token=model.config.mask_token,
            n_conditioning_codebooks=ncc,
            sampling_steps=sampling_steps,
            temperature=temperature,
            mask_temperature=mask_temperature,
            typical_filtering=typical_filtering,
            typical_mass=typical_mass,
            typical_min_tokens=typical_min_tokens,
            top_k=top_k,
            top_p=top_p if use_top_p else None,
            sample_cutoff=sample_cutoff,
            cfg_guidance=cfg_guidance,
            ctrls=ctrls,
            ctrl_masks=ctrl_masks,
            cfg_scale=cfg_scale,
            sampler_impl=sampler_impl,
        )

    return fn
