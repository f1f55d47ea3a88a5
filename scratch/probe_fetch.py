"""Round-5 probe: device->host param fetch cost through the axon tunnel.

probe_reload.py measured save_lm at 883 s — all of it the per-leaf
synchronous np.asarray D2H fetches (the H2D upload of the same 350 MB
takes ~15 s). Hypothesis: per-RPC latency dominates and overlapping the
fetches with copy_to_host_async recovers link bandwidth.

Run: python scratch/probe_fetch.py   (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import bench


def main():
    print("backend:", jax.default_backend())
    codec_cfg, iface = bench.build_iface()
    params = iface.coarse.params
    jax.block_until_ready(params)

    leaves = jax.tree_util.tree_leaves(params)
    total_mb = sum(x.size * x.dtype.itemsize for x in leaves) / 2**20
    print(f"{len(leaves)} leaves, {total_mb:.0f} MB")

    # naive sync fetch, first 16 leaves only (extrapolate)
    t0 = time.perf_counter()
    for x in leaves[:16]:
        np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"naive sync fetch, 16 leaves: {dt:.1f}s "
          f"(-> ~{dt / 16 * len(leaves):.0f}s for all {len(leaves)})",
          flush=True)

    # async-overlap fetch, ALL leaves
    t0 = time.perf_counter()
    for x in leaves:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    host = [np.asarray(x) for x in leaves]
    dt = time.perf_counter() - t0
    print(f"async-overlap fetch, all {len(leaves)} leaves: {dt:.1f}s "
          f"({total_mb / dt:.1f} MB/s)", flush=True)
    assert len(host) == len(leaves)


if __name__ == "__main__":
    main()
