"""Device-mesh construction.

The reference's only distribution is NCCL data-parallel hidden inside
torch DDP (SURVEY.md §2.3, reference scripts/exp/train.py:48,580). Here the
entire distributed story is a `jax.sharding.Mesh` with axes ("dp", "tp"):
data parallel over the dp axis (ICI within a slice; XLA routes DCN across
slices transparently), optional tensor parallel over tp for the d_model=1280
matmuls, and ZeRO-1 optimizer-state sharding along dp (partition.zero1_specs).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("dp","tp") mesh. Defaults: all devices on dp, tp=1."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_sp_mesh(
    n_devices: Optional[int] = None,
    devices=None,
) -> Mesh:
    """A ("sp",) mesh for sequence-parallel (ring-attention) inference:
    the time axis shards over it and k/v shards ride the ICI ring
    (ops/ring_attention.py). Kept separate from the ("dp","tp") compute mesh —
    SP trades all chips for one long-context request."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("sp",))


def multihost_init():  # pragma: no cover - requires a real multi-host slice
    """`jax.distributed.initialize()` for multi-host DCN training
    (reference counterpart: torchrun process-per-GPU launch)."""
    jax.distributed.initialize()
