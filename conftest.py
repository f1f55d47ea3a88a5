"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (dp/tp) is validated without real TPU hardware via
XLA's host-platform device-count override — the JAX-native "fake backend"
(SURVEY.md §4). The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter
start, so the env var alone is not enough; jax.config wins.
"""
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: no hub retries

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
