"""Mesh construction + multi-host initialization.

multihost_init is the counterpart of the reference's torchrun
process-per-GPU launch (reference scripts/exp/train.py:48,743); no real
multi-host slice exists here, so jax.distributed.initialize is stubbed and
the env-dialect parsing + idempotence are pinned directly.
"""
import jax
import pytest

from vampnet_tpu.parallel import make_mesh, make_sp_mesh
from vampnet_tpu.parallel import mesh as mesh_mod


def test_make_mesh_shapes():
    m = make_mesh(n_devices=8, tp=2)
    assert m.axis_names == ("dp", "tp")
    assert m.devices.shape == (4, 2)
    sp = make_sp_mesh(n_devices=4)
    assert sp.axis_names == ("sp",) and sp.devices.shape == (4,)
    with pytest.raises(AssertionError):
        make_mesh(n_devices=8, dp=3, tp=2)


def test_multihost_env_parsing_torchrun_dialect():
    env = {"MASTER_ADDR": "10.0.0.1", "MASTER_PORT": "29500",
           "WORLD_SIZE": "4", "RANK": "2"}
    args = mesh_mod._multihost_args_from_env(env)
    assert args == {"coordinator_address": "10.0.0.1:29500",
                    "num_processes": 4, "process_id": 2}
    # default port when torchrun's MASTER_PORT is absent
    args = mesh_mod._multihost_args_from_env({"MASTER_ADDR": "h", "RANK": "0"})
    assert args["coordinator_address"] == "h:8476"
    assert args["num_processes"] is None


def test_multihost_env_parsing_jax_dialect_wins():
    env = {"JAX_COORDINATOR_ADDRESS": "coord:1234", "JAX_NUM_PROCESSES": "16",
           "JAX_PROCESS_ID": "7", "MASTER_ADDR": "ignored", "WORLD_SIZE": "2",
           "RANK": "1"}
    args = mesh_mod._multihost_args_from_env(env)
    assert args == {"coordinator_address": "coord:1234",
                    "num_processes": 16, "process_id": 7}


def test_train_cli_joins_multihost_when_env_set(monkeypatch):
    import vampnet_tpu.parallel as par
    from vampnet_tpu.train import loop as loop_mod

    calls = []
    monkeypatch.setattr(par, "multihost_init", lambda: calls.append(1) or (0, 2))
    monkeypatch.setattr(loop_mod, "train", lambda args: "trained")
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    assert loop_mod.main([]) == "trained"
    assert not calls  # no coordinator configured -> single-host, no init
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    assert loop_mod.main([]) == "trained"
    assert calls == [1]


def test_multihost_init_idempotent(monkeypatch):
    calls = []
    monkeypatch.setattr(mesh_mod, "_MULTIHOST_STATE", None)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.9")
    monkeypatch.setenv("MASTER_PORT", "1111")
    monkeypatch.setenv("WORLD_SIZE", "2")
    monkeypatch.setenv("RANK", "1")

    pid, n = mesh_mod.multihost_init()
    assert calls == [{"coordinator_address": "10.0.0.9:1111",
                      "num_processes": 2, "process_id": 1}]
    # single-process CPU backend: the live values come from jax itself
    assert (pid, n) == (jax.process_index(), jax.process_count())

    # second call is a no-op returning the live state
    assert mesh_mod.multihost_init() == (pid, n)
    assert len(calls) == 1

    # explicit args beat the environment
    monkeypatch.setattr(mesh_mod, "_MULTIHOST_STATE", None)
    mesh_mod.multihost_init(coordinator_address="x:1", num_processes=8,
                            process_id=3, local_device_ids=[0])
    assert calls[-1] == {"coordinator_address": "x:1", "num_processes": 8,
                         "process_id": 3, "local_device_ids": [0]}

    # a second call with CONFLICTING explicit topology fails loudly
    # instead of silently returning the stale state
    monkeypatch.setattr(mesh_mod, "_MULTIHOST_STATE", (3, 8))
    assert mesh_mod.multihost_init(num_processes=8, process_id=3) == (3, 8)
    with pytest.raises(RuntimeError, match="conflicting num_processes"):
        mesh_mod.multihost_init(num_processes=16)
    with pytest.raises(RuntimeError, match="conflicting process_id"):
        mesh_mod.multihost_init(process_id=0)
