"""VampNet masked-token transformer LM — TPU-native flax implementation.

Reimplements the reference model (vampnet/modules/transformer.py:535-639):
a bidirectional pre-norm T5-style stack — RMSNorm -> self-attention with
relative-position bias (bias on layer 0 only, shared downward, :400) ->
GEGLU feed-forward — over codec-token embeddings, with a 1x1-conv (Dense)
classifier head. Both the coarse (20L) and coarse-to-fine (16L, 4 conditioning
codebooks) models are instances of this class.

TPU-first design choices vs the reference:
  * channels-last (b, t, d) layout everywhere; the reference's permutes and
    1x1 convs become plain Dense matmuls on the MXU.
  * params fp32, compute bf16 (mixed precision is structural, not an autocast).
  * logits are returned as (b, t, n_predict, vocab) — reshaping to the
    reference's flattened "b p (t c)" layout is a view, since codebook_flatten
    is t-major/c-minor (vampnet/util.py:35).
  * attention is a swappable primitive (vampnet_tpu/ops/attention.py) so the
    Pallas flash-attention kernel can replace the XLA path.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import CodebookEmbedding
from .lora import LoRADense


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Hyperparameters (defaults mirror reference transformer.py:537-552 and
    conf/vampnet.yml / conf/c2f.yml)."""

    n_heads: int = 20
    n_layers: int = 16
    n_codebooks: int = 9
    n_conditioning_codebooks: int = 0
    latent_dim: int = 8
    embedding_dim: int = 1280
    vocab_size: int = 1024
    dropout: float = 0.1
    lora_r: int = 0
    attention_num_buckets: int = 32
    attention_max_distance: int = 128
    attention_impl: str = "auto"
    ffn_impl: str = "auto"  # auto | xla | fused (ops/ffn_kernel.py)
    # gradient checkpointing: recompute each layer in the backward pass
    # instead of saving its activations — trades ~40% extra step time for
    # O(1) per-layer activation memory, for batches/sequences past what a
    # 16 GB v5e holds (with donated train state, b=16x10s still fits
    # un-rematted at coarse scale; see docs/PERF.md "Training").
    # Inference is unaffected (no saved residuals).
    remat: bool = False
    quantization: Optional[str] = None  # "int8" -> w8a8 matmuls (see modules/quantize.py)
    ctrl_dims: Optional[Tuple[Tuple[str, int], ...]] = None
    cfg_dropout_prob: float = 0.2
    # matmul/activation dtype. bf16 is the TPU fast path; "float32" exists for
    # bit-accurate parity work (e.g. the lockstep generate test runs the whole
    # MaskGIT loop against the torch reference, where bf16 rounding can flip
    # argmax ties). Params are always fp32 regardless.
    compute_dtype: str = "bfloat16"

    @property
    def n_predict_codebooks(self) -> int:
        return self.n_codebooks - self.n_conditioning_codebooks

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def mask_token(self) -> int:
        return self.vocab_size

    @staticmethod
    def coarse(**kw) -> "LMConfig":
        """conf/vampnet.yml: 4 codebooks, 20 layers."""
        return LMConfig(**{**dict(n_codebooks=4, n_conditioning_codebooks=0, n_layers=20), **kw})

    @staticmethod
    def c2f(**kw) -> "LMConfig":
        """conf/c2f.yml: 14 codebooks (4 conditioning), 16 layers."""
        return LMConfig(**{**dict(n_codebooks=14, n_conditioning_codebooks=4, n_layers=16), **kw})


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5 bucketing of relative positions (reference transformer.py:123-181),
    vectorized: half exact buckets, half log-spaced up to max_distance."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(-n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def position_bias_from_params(params, cfg, t_q: int, t_k: Optional[int] = None):
    """(heads, t_q, t_k) T5 bias computed directly from the layer-0 table.

    Building the bias costs ~2 ms at coarse shapes (bucket math + a 60 MB
    gather/transpose) — trivial once per request, ruinous once per MaskGIT
    step. The sampler computes it HERE, outside its fori_loop, and threads
    it through `forward_codes(position_bias=...)`; it depends only on the
    sequence length, never on the tokens."""
    t_k = t_q if t_k is None else t_k
    table = params["transformer"]["layers_0"]["self_attn"]["relative_attention_bias"]
    rel = jnp.arange(t_k)[None, :] - jnp.arange(t_q)[:, None]
    buckets = relative_position_bucket(
        rel,
        bidirectional=True,
        num_buckets=cfg.attention_num_buckets,
        max_distance=cfg.attention_max_distance,
    )
    return jnp.transpose(table[buckets], (2, 0, 1))


class RMSNorm(nn.Module):
    """Scale-only T5 layer norm (reference transformer.py:37-58); fp32 stats."""

    eps: float = 1e-6
    param_dtype: Any = jnp.float32
    # return the scale param instead of normalizing — feeds fused kernels
    # (ops/ffn_kernel.py) that apply the norm in VMEM; tree stays identical
    return_weight: bool = False

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        if self.return_weight:
            return weight
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (weight * y).astype(x.dtype)


class MultiHeadRelativeAttention(nn.Module):
    """Self-attention with T5 relative bias (reference transformer.py:88-257).

    LoRA adapters on q/v/out projections; k stays plain (reference :109-111).
    """

    n_head: int
    bidirectional: bool = True
    has_relative_attention_bias: bool = True
    attention_num_buckets: int = 32
    attention_max_distance: int = 128
    lora_r: int = 0
    attention_impl: str = "auto"
    quantize: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None, position_bias=None, deterministic=True):
        d_model = q.shape[-1]
        d_head = d_model // self.n_head
        dense = lambda name, r: LoRADense(
            features=d_model, r=r, dtype=self.dtype, param_dtype=self.param_dtype,
            quantize=self.quantize, name=name,
        )
        qp = dense("w_qs", self.lora_r)(q)
        kp = dense("w_ks", 0)(k)
        vp = dense("w_vs", self.lora_r)(v)
        b, tq = qp.shape[0], qp.shape[1]
        tk = kp.shape[1]
        qp = qp.reshape(b, tq, self.n_head, d_head)
        kp = kp.reshape(b, tk, self.n_head, d_head)
        vp = vp.reshape(b, tk, self.n_head, d_head)

        if self.attention_impl == "ring":
            # sequence-parallel ring attention (ops/ring_attention.py): the
            # model must be applied under shard_map with the time axis
            # sharded over mesh axis "sp". The T5 bias is never materialized;
            # the bucket TABLE is what layer 0 shares downward.
            from ..ops.ring_attention import ring_attention

            assert mask is None, "ring attention does not take a mask"
            if position_bias is None and self.has_relative_attention_bias:
                position_bias = self.param(
                    "relative_attention_bias",
                    nn.initializers.normal(stddev=1.0),
                    (self.attention_num_buckets, self.n_head),
                    self.param_dtype,
                )
            out = ring_attention(
                qp, kp, vp, position_bias, "sp",
                bucket_fn=relative_position_bucket,
                num_buckets=self.attention_num_buckets,
                max_distance=self.attention_max_distance,
                bidirectional=self.bidirectional,
            )
            out = out.reshape(b, tq, d_model)
            out = dense("fc", self.lora_r)(out)
            return out, position_bias

        if position_bias is None and self.has_relative_attention_bias:
            position_bias = self.compute_bias(tq, tk)

        out = dot_product_attention(
            qp, kp, vp, bias=position_bias, mask=mask, impl=self.attention_impl
        )
        out = out.reshape(b, tq, d_model)
        out = dense("fc", self.lora_r)(out)
        return out, position_bias

    def compute_bias(self, query_length: int, key_length: int) -> jnp.ndarray:
        """(heads, t_q, t_k) additive bias (reference transformer.py:183-209)."""
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.attention_num_buckets, self.n_head),
            self.param_dtype,
        )
        rel = jnp.arange(key_length)[None, :] - jnp.arange(query_length)[:, None]
        buckets = relative_position_bucket(
            rel,
            bidirectional=self.bidirectional,
            num_buckets=self.attention_num_buckets,
            max_distance=self.attention_max_distance,
        )
        values = table[buckets]  # (t_q, t_k, heads)
        return jnp.transpose(values, (2, 0, 1))


class FeedForward(nn.Module):
    """GEGLU feed-forward, 4x width (reference transformer.py:61-85).

    With `norm_weight` given, runs the fused Pallas path instead: the whole
    RMSNorm -> w_1 -> GEGLU -> w_2 -> +residual chain in one kernel
    (ops/ffn_kernel.py), taking the PRE-norm x and returning x + FFN(norm(x)).
    """

    dropout: float = 0.1
    lora_r: int = 0
    quantize: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, norm_weight=None, interpret=False):
        d_model = x.shape[-1]
        if norm_weight is not None:
            from ..ops.ffn_kernel import fused_geglu_ffn

            w1 = LoRADense(
                features=d_model * 4, dtype=self.dtype,
                param_dtype=self.param_dtype, expose_kernel=True, name="w_1",
            )(x)
            w2 = LoRADense(
                features=d_model, dtype=self.dtype,
                param_dtype=self.param_dtype, expose_kernel=True,
                in_features=d_model * 2, name="w_2",
            )(x)
            return fused_geglu_ffn(
                x.astype(self.dtype), norm_weight, w1, w2, interpret=interpret
            )
        h = LoRADense(
            features=d_model * 4, r=self.lora_r, dtype=self.dtype,
            param_dtype=self.param_dtype, quantize=self.quantize, name="w_1",
        )(x)
        p1, p2 = jnp.split(h, 2, axis=-1)
        h = p1 * nn.gelu(p2, approximate=True)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return LoRADense(
            features=d_model, r=self.lora_r, dtype=self.dtype,
            param_dtype=self.param_dtype, quantize=self.quantize, name="w_2",
        )(h)


class TransformerLayer(nn.Module):
    """Pre-norm block: RMSNorm->self-attn->residual, RMSNorm->FFN->residual
    (reference transformer.py:260-369; FiLM is inert and omitted)."""

    n_heads: int
    has_relative_attention_bias: bool = False
    dropout: float = 0.1
    lora_r: int = 0
    attention_num_buckets: int = 32
    attention_max_distance: int = 128
    attention_impl: str = "auto"
    ffn_impl: str = "auto"  # auto | xla | fused (Pallas norm+GEGLU+residual)
    quantize: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _use_fused_ffn(self, deterministic: bool) -> bool:
        if self.ffn_impl != "fused" or self.is_initializing():
            # "auto" resolves to XLA: the fused kernel measured NET NEGATIVE
            # at serving shapes (15.0 vs 14.1 ms/forward, scratch/bench_forward)
            # — streaming w1/w2 per row-block re-reads 19.6 MB of weights
            # n_m_blocks times, which costs more than the eliminated hidden
            # intermediates. Kept as an opt-in for small-m regimes.
            return False
        # the fused kernel has no dropout, LoRA, or int8 path; a bare assert
        # would vanish under python -O and silently drop LoRA deltas
        if not (deterministic and self.lora_r == 0 and not self.quantize):
            raise ValueError(
                "ffn_impl='fused' needs deterministic=True, lora_r=0, no int8"
            )
        return True

    @nn.compact
    def __call__(self, x, x_mask=None, position_bias=None, deterministic=True):
        y = RMSNorm(name="norm_1")(x)
        y, position_bias = MultiHeadRelativeAttention(
            n_head=self.n_heads,
            has_relative_attention_bias=self.has_relative_attention_bias,
            attention_num_buckets=self.attention_num_buckets,
            attention_max_distance=self.attention_max_distance,
            lora_r=self.lora_r,
            attention_impl=self.attention_impl,
            quantize=self.quantize,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(y, y, y, mask=x_mask, position_bias=position_bias, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)

        if self._use_fused_ffn(deterministic):
            # one Pallas kernel: norm + GEGLU FFN + residual (ffn_impl="fused"
            # outside TPU runs the interpreter — parity tests only)
            nw = RMSNorm(name="norm_3", return_weight=True)(x)
            x = FeedForward(
                dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name="feed_forward",
            )(x, deterministic=deterministic, norm_weight=nw,
              interpret=jax.default_backend() != "tpu")
        else:
            y = RMSNorm(name="norm_3")(x)
            y = FeedForward(
                dropout=self.dropout, lora_r=self.lora_r, dtype=self.dtype,
                param_dtype=self.param_dtype, quantize=self.quantize,
                name="feed_forward",
            )(y, deterministic=deterministic)
            x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x, position_bias


class TransformerStack(nn.Module):
    """N layers; relative bias lives on layer 0 and is shared downward
    (reference transformer.py:372-463)."""

    n_heads: int
    n_layers: int
    dropout: float = 0.1
    lora_r: int = 0
    attention_num_buckets: int = 32
    attention_max_distance: int = 128
    attention_impl: str = "auto"
    ffn_impl: str = "auto"
    remat: bool = False
    quantize: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, deterministic=True, return_activations=False,
                 position_bias=None):
        activations = []
        layer_cls = TransformerLayer
        if self.remat:
            # checkpoint each layer: backward recomputes the layer forward
            # instead of holding its activations (jax.checkpoint semantics).
            # deterministic must be static (argnum 4; the module is 0) —
            # Dropout branches on it in Python
            layer_cls = nn.remat(TransformerLayer, static_argnums=(4,))
        for i in range(self.n_layers):
            x, position_bias = layer_cls(
                n_heads=self.n_heads,
                has_relative_attention_bias=(i == 0),
                dropout=self.dropout,
                lora_r=self.lora_r,
                attention_num_buckets=self.attention_num_buckets,
                attention_max_distance=self.attention_max_distance,
                attention_impl=self.attention_impl,
                ffn_impl=self.ffn_impl,
                quantize=self.quantize,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x, x_mask, position_bias, deterministic)
            if return_activations:
                activations.append(x)
        out = RMSNorm(name="norm")(x)
        if return_activations:
            return out, jnp.stack(activations)
        return out


class CFGDropout(nn.Module):
    """Classifier-free-guidance dropout along the batch dim
    (reference transformer.py:465-477)."""

    p: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic=True):
        if deterministic or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.uniform(rng, (x.shape[0],) + (1,) * (x.ndim - 1)) > self.p
        return x * keep


class ControlEncoder(nn.Module):
    """Per-control linear encoders + CFG dropout (reference transformer.py:479-533).

    ctrls / ctrl_masks are dicts keyed like ctrl_dims; tensors are
    (b, t, dim) / (b, t).
    """

    ctrl_dims: Tuple[Tuple[str, int], ...]
    cfg_dropout_prob: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embedding, ctrls, ctrl_masks, deterministic=True):
        keys = sorted(k for k, _ in self.ctrl_dims)
        assert sorted(ctrls.keys()) == keys, "ctrls and ctrl_encoders keys do not match"
        assert sorted(ctrl_masks.keys()) == keys, "ctrl_masks keys do not match"
        out = jnp.zeros_like(embedding)
        for name, _dim in self.ctrl_dims:
            ctrl = ctrls[name].astype(self.dtype)
            emb = nn.Dense(
                embedding.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"ctrl_{name}",
            )(ctrl)
            emb = emb * ctrl_masks[name][:, :, None].astype(self.dtype)
            emb = CFGDropout(p=self.cfg_dropout_prob, name=f"cfg_{name}")(
                emb, deterministic=deterministic
            )
            out = out + emb
        out = CFGDropout(p=self.cfg_dropout_prob / 2, name="cfg_all")(
            out, deterministic=deterministic
        )
        return out


class VampNetLM(nn.Module):
    """The full LM (reference transformer.py:535-639)."""

    config: LMConfig

    def setup(self):
        cfg = self.config
        self.embedding = CodebookEmbedding(
            vocab_size=cfg.vocab_size,
            latent_dim=cfg.latent_dim,
            n_codebooks=cfg.n_codebooks,
            emb_dim=cfg.embedding_dim,
            special_tokens=("MASK",),
            dtype=cfg.dtype,
            name="embedding",
        )
        self.transformer = TransformerStack(
            n_heads=cfg.n_heads,
            n_layers=cfg.n_layers,
            dropout=cfg.dropout,
            lora_r=cfg.lora_r,
            attention_num_buckets=cfg.attention_num_buckets,
            attention_max_distance=cfg.attention_max_distance,
            attention_impl=cfg.attention_impl,
            ffn_impl=cfg.ffn_impl,
            remat=cfg.remat,
            quantize=cfg.quantization == "int8",
            dtype=cfg.dtype,
            name="transformer",
        )
        # 1x1 conv classifier (reference transformer.py:596-604) as a Dense.
        # Feature order is CODEBOOK-major/vocab-minor — the reference's
        # "b (p c) t" channels are vocab-major, but emitting that layout
        # costs a minor-dim (V, C) -> (C, V) transpose of the ~28 MB logits
        # tensor every forward (~2 ms on v5e). Converters permute the kernel
        # columns instead (convert.py), so the reshape below is free.
        self.classifier = nn.Dense(
            cfg.vocab_size * cfg.n_predict_codebooks,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="classifier",
        )
        if cfg.ctrl_dims is not None:
            self.ctrl_encoder = ControlEncoder(
                ctrl_dims=cfg.ctrl_dims,
                cfg_dropout_prob=cfg.cfg_dropout_prob,
                dtype=cfg.dtype,
                name="ctrl_encoder",
            )

    @property
    def mask_token(self) -> int:
        return self.config.mask_token

    def __call__(
        self,
        latents: jnp.ndarray,  # (b, t, n_codebooks*latent_dim)
        ctrls=None,
        ctrl_masks=None,
        deterministic: bool = True,
        return_activations: bool = False,
        position_bias=None,  # precomputed T5 bias (position_bias_from_params)
    ):
        """Returns logits (b, t, n_predict_codebooks, vocab) in fp32.

        Reshape to (b, t*c, vocab) for the flattened layout — identical memory
        order to the reference's "b p (t c)" after its permute (:634).
        """
        cfg = self.config
        x = self.embedding(latents)
        if cfg.ctrl_dims is not None:
            x = x + self.ctrl_encoder(x, ctrls, ctrl_masks, deterministic=deterministic)
        out = self.transformer(
            x, deterministic=deterministic, return_activations=return_activations,
            position_bias=position_bias,
        )
        if return_activations:
            out, activations = out
        logits = self.classifier(out)  # (b, t, C*vocab), codebook-major
        b, t, _ = logits.shape
        logits = logits.reshape(
            b, t, cfg.n_predict_codebooks, cfg.vocab_size
        ).astype(jnp.float32)
        if return_activations:
            return logits, activations
        return logits

    def r_embed(self, r, max_positions: int = 10000):
        """Mask-ratio embedding (reference transformer.py:641-659). The
        shipped models assert r_cond_dim == 0 (:554), in which case the
        reference returns r unchanged — reproduced here; the sinusoidal
        branch is intentionally unsupported like the reference's assert."""
        return r

    def from_codes(self, codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
        return self.embedding.from_codes(codes, codebooks)

    def embed_codes(self, codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
        return self.embedding.embed_codes(codes, codebooks)

    def forward_codes(
        self,
        codes: jnp.ndarray,
        codebooks: jnp.ndarray,
        ctrls=None,
        ctrl_masks=None,
        deterministic: bool = True,
        position_bias=None,
    ):
        """codes -> logits in one call (sampler hot path)."""
        return self(
            self.from_codes(codes, codebooks),
            ctrls=ctrls,
            ctrl_masks=ctrl_masks,
            deterministic=deterministic,
            position_bias=position_bias,
        )
