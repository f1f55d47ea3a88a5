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


_MULTIHOST_STATE: Optional[tuple] = None


def _multihost_args_from_env(env=None) -> dict:
    """Coordinator/world/rank from the environment.

    Two launcher dialects are understood, in precedence order:
    - JAX-native: ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
      ``JAX_PROCESS_ID`` (what `jax.distributed` itself documents);
    - torchrun-style: ``MASTER_ADDR``[:``MASTER_PORT``] / ``WORLD_SIZE`` /
      ``RANK`` — so the reference's multi-GPU launch scripts
      (reference README "how to train a model": `torchrun --nproc_per_node gpu`,
      scripts/exp/train.py:743) carry over to a multi-host TPU job unchanged.

    Missing keys stay None: on Cloud TPU pods `jax.distributed.initialize()`
    auto-detects all three from the TPU metadata server.
    """
    import os

    env = os.environ if env is None else env
    addr = env.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and "MASTER_ADDR" in env:
        addr = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '8476')}"

    def _int(*keys):
        for k in keys:
            if k in env:
                return int(env[k])
        return None

    return {
        "coordinator_address": addr,
        "num_processes": _int("JAX_NUM_PROCESSES", "WORLD_SIZE"),
        "process_id": _int("JAX_PROCESS_ID", "RANK"),
    }


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> tuple:
    """Initialize the multi-host JAX runtime (DCN) and return
    ``(process_id, num_processes)``.

    Reference counterpart: torchrun's process-per-device launch hidden inside
    `audiotools.ml.Accelerator` (reference scripts/exp/train.py:48,743; README
    "multi-gpu training"). Here one process per HOST joins a coordinator;
    after this, `jax.devices()` is the global slice and everything else is
    sharding annotations over one `Mesh` — no per-rank code.

    Explicit args win; otherwise the environment is consulted
    (`_multihost_args_from_env`: JAX-native or torchrun-style vars); on Cloud
    TPU pods all-None auto-detects. Idempotent — a second call returns the
    live (process_id, num_processes) without re-initializing.
    """
    global _MULTIHOST_STATE
    if _MULTIHOST_STATE is not None:
        # loud, not silent: a second call with explicit args that disagree
        # with the live topology is a misconfigured launcher
        live_pid, live_n = _MULTIHOST_STATE
        if process_id is not None and process_id != live_pid:
            raise RuntimeError(
                f"multihost_init already initialized with process_id={live_pid}, "
                f"got conflicting process_id={process_id}"
            )
        if num_processes is not None and num_processes != live_n:
            raise RuntimeError(
                f"multihost_init already initialized with num_processes={live_n}, "
                f"got conflicting num_processes={num_processes}"
            )
        return _MULTIHOST_STATE
    env_args = _multihost_args_from_env()
    kwargs = dict(
        coordinator_address=coordinator_address or env_args["coordinator_address"],
        num_processes=(
            num_processes if num_processes is not None else env_args["num_processes"]
        ),
        process_id=process_id if process_id is not None else env_args["process_id"],
    )
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _MULTIHOST_STATE = (jax.process_index(), jax.process_count())
    return _MULTIHOST_STATE
