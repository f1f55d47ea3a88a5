"""Round-5 probe: where do the seconds go in Interface.reload on the axon
backend? (The fresh-clone driver sim read hot_swap_reload_s = 702 s while
fat-runtime-cache runs read 15-22 s.)

Run: python scratch/probe_reload.py   (real TPU; uses the repo .jax_cache)
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


def t(label, f):
    t0 = time.perf_counter()
    out = f()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s", flush=True)
    return out


def main():
    print("backend:", jax.default_backend())
    import tempfile

    from vampnet_tpu.checkpoints import load_lm, save_lm

    codec_cfg, iface = bench.build_iface()

    with tempfile.TemporaryDirectory() as td:
        swap_path = os.path.join(td, "coarse_swap.vtpu")
        t("save_lm (device fetch + msgpack + write)",
          lambda: save_lm(swap_path, iface.coarse.config, iface.coarse.params))
        cfg_params = t("load_lm (read + msgpack + _to_jnp device puts)",
                       lambda: load_lm(swap_path))
        t("block_until_ready(loaded params)",
          lambda: jax.block_until_ready(cfg_params[1]))
        t("iface.reload(coarse_ckpt=...)",
          lambda: iface.reload(coarse_ckpt=swap_path))
        t("block_until_ready(iface.coarse.params)",
          lambda: jax.block_until_ready(iface.coarse.params))


if __name__ == "__main__":
    main()
