"""Parameter partition specs for the VampNet LM.

Megatron-style tensor parallel over the "tp" mesh axis:
  * q/k/v projections + FFN w_1 shard the OUTPUT features (head/hidden dim),
  * attention out (fc) + FFN w_2 shard the INPUT features,
so each attention head / FFN slice lives on one shard and XLA inserts a single
reduce (psum) per block. Everything else (norms, biases, embeddings) is
replicated. ZeRO-1 shards Adam moments along "dp" on top of whatever tp
sharding the parameter already has (reference counterpart:
ZeroRedundancyOptimizer, scripts/exp/train.py:588-590).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import PartitionSpec as P


_COL = {"w_qs", "w_ks", "w_vs", "w_1"}  # shard output dim
_ROW = {"fc", "w_2"}  # shard input dim


def _spec_for_path(path) -> P:
    keys = [str(getattr(k, "key", k)) for k in path]
    leaf = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    if leaf == "kernel_scale":
        return P("tp") if parent in _COL else P()
    if leaf in ("kernel", "kernel_q"):
        if parent in _COL:
            return P(None, "tp")
        if parent in _ROW:
            return P("tp", None)
        if parent == "classifier":
            return P(None, "tp")
        if parent == "out_proj":  # codebook embedding projection
            return P(None, "tp")
        return P()
    if leaf in ("lora_a", "lora_b"):
        # adapters are tiny; replicate
        return P()
    return P()


def lm_param_specs(params) -> Any:
    """Pytree of PartitionSpec matching the LM param tree."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _spec_for_path(p), params)


def zero1_specs(
    param_specs, params, dp_size: int, dp_axis: str = "dp", min_size: int = 2**14
) -> Any:
    """ZeRO-1: optimizer-moment specs = param specs with the first unsharded,
    dp-divisible axis additionally sharded over dp. Small leaves stay
    replicated (the collective would cost more than the memory saved)."""

    def one(spec: P, x) -> P:
        if x.ndim == 0 or x.size < min_size or dp_size <= 1:
            return spec
        entries = list(spec) + [None] * (x.ndim - len(spec))
        for i, (e, dim) in enumerate(zip(entries, x.shape)):
            if e is None and dim % dp_size == 0:
                entries[i] = dp_axis
                return P(*entries)
        return spec

    return jax.tree_util.tree_map(one, param_specs, params)


def opt_state_specs(opt_state, param_specs) -> Any:
    """PartitionSpec tree for an optax state: any leaf whose tree path ends
    with a parameter's path (Adam mu/nu embed the param tree) inherits that
    parameter's (ZeRO-1) spec; scalars/counters replicate.

    Works for arbitrarily nested optax states (chain / multi_transform /
    masked) where `optax.tree_map_params` trips over PartitionSpec leaves.
    """
    flat_specs = {
        tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            param_specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }

    def lookup(path, leaf):
        keys = tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for plen in range(len(keys), 0, -1):
            spec = flat_specs.get(keys[-plen:])
            if spec is not None and len(spec) <= getattr(leaf, "ndim", 0):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(lookup, opt_state)
