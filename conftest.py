"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (dp/tp) is validated without real TPU hardware via
XLA's host-platform device-count override — the JAX-native "fake backend"
(SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
