"""The jitted training step (reference scripts/exp/train.py:237-307).

One device program per step: frozen-codec encode -> schedule-ratio random mask
-> LM forward (bf16, dropout on) -> masked cross-entropy with label smoothing
-> grad clip -> AdamW + Noam. Under a ("dp","tp") mesh the same step becomes
the distributed program: batch sharded over dp, matmuls over tp (parameter
specs from vampnet_tpu.parallel), Adam moments ZeRO-1-sharded over dp.

LoRA fine-tuning = the same step with an optax.masked optimizer that updates
only lora_a/lora_b leaves (reference train.py:696 mark_only_lora_as_trainable).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .. import mask as pmask
from ..util import codebook_flatten
from .scheduler import noam_schedule

IGNORE_INDEX = -100  # reference scripts/exp/train.py:68


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def _scale_by_adam_lowmem(
    b1: float, b2: float, eps: float, state_dtype
) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in `state_dtype` (bf16 halves
    the optimizer's HBM: at coarse scale m+v are 2.6 GB fp32 and the AdamW
    update sits exactly at its ~9.3 GB memory roofline — docs/PERF.md "Step
    decomposition"). Moment math runs in fp32 and is rounded once on store;
    reuses optax.ScaleByAdamState so ZeRO-1 specs / orbax checkpoints see the
    same tree structure as stock adamw."""
    tree_map = jax.tree_util.tree_map

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=tree_map(zeros, params),
            nu=tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        f32 = jnp.float32
        mu32 = tree_map(
            lambda g, m: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            updates, state.mu,
        )
        nu32 = tree_map(
            lambda g, n: b2 * n.astype(f32)
            + (1 - b2) * jnp.square(g.astype(f32)),
            updates, state.nu,
        )
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        out = tree_map(
            lambda g, m, n: ((m / bc1) / (jnp.sqrt(n / bc2) + eps)).astype(g.dtype),
            updates, mu32, nu32,
        )
        cast = lambda t: tree_map(lambda x: x.astype(state_dtype), t)
        return out, optax.ScaleByAdamState(count, cast(mu32), cast(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    d_model: int,
    factor: float = 2.0,
    warmup: int = 10000,
    weight_decay: float = 0.01,
    grad_clip: float = 5.0,
    lora_filter: Optional[Any] = None,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW + grad clip + Noam schedule (reference conf/vampnet.yml:
    AdamW.lr scaled by NoamScheduler factor=2.0 warmup=10000; clip 5.0 at
    train.py:296). With `lora_filter`, only adapter leaves are updated.
    `state_dtype="bfloat16"` stores the Adam moments low-precision
    (opt-in memory/bandwidth lever; default keeps fp32 parity)."""
    lr = noam_schedule(d_model, factor=factor, warmup=warmup)
    if state_dtype is None or jnp.dtype(state_dtype) == jnp.float32:
        adam = optax.adamw(
            learning_rate=lr, b1=0.9, b2=0.999, weight_decay=weight_decay
        )
    else:
        adam = optax.chain(
            _scale_by_adam_lowmem(
                b1=0.9, b2=0.999, eps=1e-8, state_dtype=jnp.dtype(state_dtype)
            ),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    if lora_filter is not None:
        labels = jax.tree_util.tree_map(
            lambda is_lora: "lora" if is_lora else "frozen", lora_filter
        )
        tx = optax.multi_transform(
            {"lora": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def loss_and_metrics(
    logits: jnp.ndarray,  # (b, t, c_predict, vocab) fp32
    target: jnp.ndarray,  # (b, c_predict, t) int
    flat_mask: jnp.ndarray,  # (b, t*c) int — 1 where loss counts
    r: jnp.ndarray,  # (b,) mask ratios, for bucketed accuracy
    label_smoothing: float = 0.1,
):
    """Masked CE + the reference's stratified accuracy metrics
    (reference train.py:184-213,268-278)."""
    b, t, c, v = logits.shape
    logits_flat = logits.reshape(b, t * c, v)
    target_flat = codebook_flatten(target)

    # gather-form smoothed CE — algebraically identical to
    # -(onehot*(1-ls)+ls/v) . log_softmax but never materializes the dense
    # (b, t*c, v) one-hot/smoothed/log-prob tensors (3 x 113 MB at coarse
    # scale): CE = lse - (1-ls)*logit[target] - ls*mean(logits)
    lse = jax.scipy.special.logsumexp(logits_flat, axis=-1)
    tgt_logit = jnp.take_along_axis(
        logits_flat, target_flat[..., None], axis=-1
    )[..., 0]
    ce = (
        lse
        - (1 - label_smoothing) * tgt_logit
        - label_smoothing * logits_flat.mean(-1)
    )  # (b, t*c)

    w = flat_mask.astype(jnp.float32)
    loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

    metrics = {"loss": loss}
    pred = jnp.argmax(logits_flat, axis=-1)
    top25 = jax.lax.top_k(logits_flat, 25)[1]
    hit1 = (pred == target_flat).astype(jnp.float32)
    hit25 = (top25 == target_flat[..., None]).any(-1).astype(jnp.float32)
    for lo, hi in ((0.0, 0.5), (0.5, 1.0)):
        in_bucket = ((r >= lo) & (r < hi)).astype(jnp.float32)[:, None]
        for name, sel in (("masked", w), ("unmasked", 1.0 - w)):
            sel_b = sel * in_bucket
            denom = jnp.maximum(sel_b.sum(), 1.0)
            metrics[f"accuracy-{lo}-{hi}/top1/{name}"] = (hit1 * sel_b).sum() / denom
            metrics[f"accuracy-{lo}-{hi}/top25/{name}"] = (hit25 * sel_b).sum() / denom
    return loss, metrics


def make_train_step(
    lm_model,
    codec_model,
    optimizer: optax.GradientTransformation,
    label_smoothing: float = 0.1,
    controller=None,
    encode_microbatch: Optional[int] = None,
) -> Callable:
    """Returns train_step(state, codec_params, codebooks, audio, key)
    -> (state, metrics). Encode-on-the-fly with the frozen codec
    (reference train.py:245-248), then masked-token LM training.

    `encode_microbatch=k` runs the frozen-codec encode in serial sub-batches
    of k rows (lax.map). The encoder's first conv block holds three
    fp32 (b, n_samples, 64) activations — 6.7 GB EACH at b=32 x 10 s (the
    64-channel dim pads to 128 lanes) — which is what OOMs large batches,
    not the LM. Encode is <3% of step compute, so serializing it costs
    little; it changes no numerics (same codec, per-row deterministic).

    With a `Sketch2SoundController`, control features (RMS/chroma) are
    extracted IN-GRAPH from the same audio batch and fed through the
    ControlEncoder with random control masks (the sketch2sound training
    path the reference left commented out at train.py:70,124-138,620)."""
    n_cb = lm_model.config.n_codebooks
    ncc = lm_model.config.n_conditioning_codebooks
    mask_token = lm_model.config.mask_token

    def train_step(state: TrainState, codec_params, codebooks, audio, key):
        k_r, k_mask, k_drop, k_ctrl = jax.random.split(key, 4)

        def encode(a):
            return codec_model.apply(
                {"params": codec_params}, a, method="encode"
            )["codes"]

        mb = encode_microbatch
        if mb:
            # loud, not silent: a user sets this because the full-batch encode
            # OOMs — falling back would reproduce the OOM and look like the
            # knob is broken (trace-time check; shapes are static under jit)
            if audio.shape[0] % mb != 0:
                raise ValueError(
                    f"encode_microbatch={mb} must divide the batch "
                    f"({audio.shape[0]})"
                )
        if mb and 0 < mb < audio.shape[0]:
            grouped = audio.reshape(audio.shape[0] // mb, mb, *audio.shape[1:])
            codes = jax.lax.map(encode, grouped)
            codes = codes.reshape(audio.shape[0], *codes.shape[2:])
        else:
            codes = encode(audio)
        z = jax.lax.stop_gradient(codes[:, :n_cb, :])
        b = z.shape[0]

        r = jax.random.uniform(k_r, (b,))
        mask = pmask.random(k_mask, z, r)
        mask = pmask.codebook_unmask(mask, ncc)
        z_masked, mask = pmask.apply_mask(z, mask, mask_token)

        ctrls = ctrl_masks = None
        if controller is not None:
            ctrls = controller.extract(audio[..., 0])
            ctrls = {k: v[:, : z.shape[-1], :] for k, v in ctrls.items()}
            ctrl_masks = controller.random_mask(ctrls, r, k_ctrl)
            ctrl_masks = {k: v[:, : z.shape[-1]] for k, v in ctrl_masks.items()}

        flat_mask = codebook_flatten(mask[:, ncc:, :])
        target = z[:, ncc:, :]

        def loss_fn(params):
            logits = lm_model.apply(
                {"params": params},
                z_masked,
                codebooks,
                ctrls,
                ctrl_masks,
                deterministic=False,
                rngs={"dropout": k_drop},
                method="forward_codes",
            )
            return loss_and_metrics(
                logits, target, flat_mask, r, label_smoothing=label_smoothing
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
