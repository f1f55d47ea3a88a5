"""Embedding and small layers (reference vampnet/modules/layers.py).

`CodebookEmbedding` maps RVQ token ids to continuous latents using the
*codec's own codebook tables* plus a learned MASK latent per codebook, then
projects to the transformer width (reference layers.py:105-163). The 1x1 conv
of the reference is a Dense here (channels-last (b, t, d) layout — the native
TPU/XLA layout).

FiLM is inert in the shipped models (input_dim == 0, reference layers.py:81-102
with r_cond_dim=0 asserted at transformer.py:554), so it is intentionally not
reproduced; conditioning enters via `ControlEncoder` instead.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class CodebookEmbedding(nn.Module):
    vocab_size: int
    latent_dim: int
    n_codebooks: int
    emb_dim: int
    special_tokens: Tuple[str, ...] = ("MASK",)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def special_idxs(self):
        return {tkn: i + self.vocab_size for i, tkn in enumerate(self.special_tokens)}

    @property
    def mask_token(self) -> int:
        return self.special_idxs["MASK"]

    def setup(self):
        # one learned latent row per (special token, codebook) — reference
        # layers.py:120-127
        self.special = {
            tkn: self.param(
                f"special_{tkn}",
                nn.initializers.normal(stddev=1.0),
                (self.n_codebooks, self.latent_dim),
                self.param_dtype,
            )
            for tkn in self.special_tokens
        }
        self.out_proj = nn.Dense(
            self.emb_dim,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_proj",
        )

    def from_codes(self, codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
        """Look up latents for token ids, including special rows.

        codes:      (b, n_codebooks, t) int ids in [0, vocab+n_special)
        codebooks:  (n_codebooks, vocab, latent_dim) — the codec quantizer
                    tables (reference layers.py:145 reads
                    codec.quantizer.quantizers[i].codebook.weight)
        returns:    (b, t, n_codebooks*latent_dim) latents, codebook-major
                    feature blocks (matches the reference channel order).
        """
        n_cb = codes.shape[1]
        special_rows = jnp.stack(
            [self.special[tkn] for tkn in self.special_tokens], axis=1
        )  # (n_codebooks, n_special, latent)
        table = jnp.concatenate(
            [codebooks, special_rows.astype(codebooks.dtype)], axis=1
        )  # (n_codebooks, vocab+n_special, latent)
        # one-hot matmul instead of a gather: TPU gathers with an
        # 8-element minor dim serialize badly; a 0/1 contraction selects the
        # same rows exactly (one nonzero product per output) and rides the
        # MXU, with the one-hot fused into the dot by XLA
        onehot = jax.nn.one_hot(codes, table.shape[1], dtype=table.dtype)
        latent = jnp.einsum(
            "bcts,csl->bctl", onehot, table,
            preferred_element_type=table.dtype,
        )  # (b, n_cb, t, latent)
        b, _, t, ld = latent.shape
        return jnp.swapaxes(latent, 1, 2).reshape(b, t, n_cb * ld)

    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Project latents (b, t, n_codebooks*latent_dim) -> (b, t, emb_dim)."""
        return self.out_proj(latents.astype(self.dtype))

    def embed_codes(self, codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
        """Fused lookup+projection for the sampler hot loop."""
        return self(self.from_codes(codes, codebooks))
