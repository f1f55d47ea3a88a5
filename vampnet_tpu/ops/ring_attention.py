"""Ring attention over a sequence-sharded mesh axis (SURVEY.md §5.7 stretch).

Chunk-free long context across chips: the sequence axis is sharded over a
mesh axis (`sp`); each device holds q/k/v shards of t/n_dev positions and
an online-softmax accumulator. At every ring step a device contracts its
queries against the k/v shard it currently holds, then passes that shard to
its ring neighbor with `jax.lax.ppermute` — which XLA lowers to ICI
collective-permute on TPU, overlapping transfer with the next step's
compute. Peak memory is O(t/n) per device and the full (t, t) score or bias
matrix never exists anywhere.

The T5 relative-position bias is NOT materialized either: each step
computes its (h, t_local, t_local) bias block from the bucket table and the
global offsets of the (q shard, current k shard) pair.

The reference has no sequence parallelism at all — long audio is handled by
host-side windowed chunking (reference vampnet/interface.py:397-441); this
is the TPU-native answer for genuinely unchunked long context.

Use under shard_map, e.g.:

    shard_map(
        lambda q, k, v, tbl: ring_attention(q, k, v, tbl, "sp", bucket_fn=...),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3 + (P(),),
        out_specs=P(None, "sp", None, None),
    )
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def ring_attention(
    q: jnp.ndarray,  # (b, t_local, h, d) — this device's query shard
    k: jnp.ndarray,  # (b, t_local, h, d) — this device's key shard
    v: jnp.ndarray,  # (b, t_local, h, d)
    bias_table: Optional[jnp.ndarray],  # (num_buckets, h) T5 table, or None
    axis_name: str,
    bucket_fn: Optional[Callable] = None,  # relative_position_bucket
    num_buckets: int = 32,
    max_distance: int = 128,
    bidirectional: bool = True,
) -> jnp.ndarray:
    """softmax(q K^T / sqrt(d) + T5 bias) V with K/V ring-passed over
    `axis_name`. Returns this device's (b, t_local, h, d) output shard."""
    b, tl, h, d = q.shape
    n_dev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    # base-2 softmax with scale*log2e folded into q — same VPU economy as
    # ops/flash_attention.py (one (t, d) multiply instead of per-step
    # (tl, tl) scale passes; exp2 skips exp's base conversion)
    from .flash_attention import LOG2E

    # MXU dots run on the input dtype with f32 accumulation (bf16 operands
    # are exact — same rationale as ops/flash_attention.py)
    qf = (
        jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32)
        * (LOG2E / (d ** 0.5))
    ).astype(q.dtype)  # (b, h, tl, d)

    def bias_block(src):
        if bias_table is None:
            return jnp.zeros((h, tl, tl), jnp.float32)
        q_pos = my * tl + jnp.arange(tl)
        k_pos = src * tl + jnp.arange(tl)
        rel = k_pos[None, :] - q_pos[:, None]
        buckets = bucket_fn(
            rel,
            bidirectional=bidirectional,
            num_buckets=num_buckets,
            max_distance=max_distance,
        )
        return jnp.transpose(
            bias_table.astype(jnp.float32)[buckets], (2, 0, 1)
        )  # (h, tl, tl)

    # shard_map gives a concrete mesh, so the axis size is static at trace
    # time; after i permutes along this ring, device j holds shard (j+i) % n
    n = int(n_dev)
    perm = [(j, (j - 1) % n) for j in range(n)]

    def step(i, carry):
        m, l, acc, k_cur, v_cur = carry
        src = (my + i) % n  # global shard index currently held
        kf = jnp.transpose(k_cur, (0, 2, 1, 3))
        vf = jnp.transpose(v_cur, (0, 2, 1, 3))
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                       preferred_element_type=jnp.float32)
            + bias_block(src)[None] * LOG2E
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vf.dtype), vf,
            preferred_element_type=jnp.float32,
        )
        # pass the shard along the ring (skipped after the last step; the
        # step loop is a python for over the static axis size)
        if i < n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, l, acc, k_cur, v_cur

    m0 = jnp.full((b, h, tl, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, tl, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, tl, d), jnp.float32)
    carry = (m0, l0, acc0, k, v)
    # python loop, not fori_loop: ppermute inside lax.cond needs concrete
    # branch structure per step anyway, and n is small (mesh axis size)
    for i in range(n):
        carry = step(i, carry)
    m, l, acc, _, _ = carry
    out = acc / l
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
