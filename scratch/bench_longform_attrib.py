"""Round-5 probe: attribute the long-form gap (VERDICT r4 item 6).

60 s b=1 ran at 32.3 audio_s/s (r4c builder log) vs 45.8 for 10 s b=2 —
where does the extra ~30% go? Hypotheses: (a) pure tunnel/transfer (the 60 s
waveform is 3x the bytes, and the request is one dispatch either way);
(b) a sublinear device stage (coarse runs internal batch 6 at t=861 — past
the b=8 HBM-pressure knee from the r3 sweep? c2f runs internal batch 20);
(c) encode/decode at 60 s.

Method (CLAUDE.md measurement rule): chained differentials ONLY — the 60 s
e2e program fed back into itself under a dynamic-trip fori_loop (one
compile), giving device_program_s for the long-form request. Comparing that
against 3x the 10 s-b=2 device time (same total audio seconds... n.b. 60 s
b=1 generates 60 audio_s vs 20 audio_s for 10 s b=2, so the fair scale
factor for compute is 3x) splits hypothesis (a) from (b)+(c). Stage-level
differentials (coarse loop at (6,4,861), c2f at (20,14,258), codec 60 s)
run when BENCH_STAGES=1 to localize any device-side gap.

Run: python scratch/bench_longform_attrib.py   (real TPU; keep .jax_cache)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench


def chained_device_time(iface, sig, batch_size, label):
    """Compile the vamp_e2e program for (sig, batch_size), then measure its
    pure device time via a dynamic-trip chained fori_loop differential."""
    n_before = len(iface._gen_cache)
    t0 = time.monotonic()
    out = iface.vamp_e2e(
        sig, batch_size=batch_size, seed=0, periodic_prompt=7,
        upper_codebook_mask=3, _sampling_steps=12, transfer_dtype="int16",
    )
    out.samples.sum()
    compile_s = time.monotonic() - t0
    walls = []
    for i in range(5):
        t0 = time.perf_counter()
        o = iface.vamp_e2e(
            sig, batch_size=batch_size, seed=i + 1, periodic_prompt=7,
            upper_codebook_mask=3, _sampling_steps=12, transfer_dtype="int16",
        )
        o.samples.sum()
        walls.append(time.perf_counter() - t0)
    p50 = float(np.median(walls))
    fn = [f for k, f in iface._gen_cache.items() if k[0] == "vamp_e2e"][-1]
    assert len(iface._gen_cache) > n_before or True

    audio_dev = jnp.asarray(iface._preprocess(sig).samples.transpose(0, 2, 1))
    cp_, co_, c2_, cb_ = (
        iface.codec_params, iface.coarse.params, iface.c2f.params,
        iface._codebooks,
    )

    @jax.jit
    def chained(audio, key, iters):
        def body(i, a):
            wav = fn(
                cp_, co_, c2_, cb_, a, jax.random.fold_in(key, i),
                jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
                jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
                jnp.float32(1.0),
            )
            if wav.dtype == jnp.int16:
                wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
            return jnp.clip(wav[0:1], -1.0, 1.0)

        out = jax.lax.fori_loop(0, iters, body, audio)
        return jnp.sum(out.astype(jnp.float32))

    key_ = jax.random.PRNGKey(3)

    def wall_iters(n, reps=2):
        # the chained compile is the remote-compile service's biggest
        # program and drops connections under load (broken pipe) — retry;
        # partial compiles are cached so each retry makes progress
        for attempt in range(4):
            try:
                np.asarray(chained(audio_dev, key_, jnp.int32(n)))
                break
            except Exception as e:
                print(f"  chained compile attempt {attempt} failed: {e!r}",
                      flush=True)
                if attempt == 3:
                    raise
                time.sleep(30)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(audio_dev, key_, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w4 = wall_iters(1), wall_iters(4)
    dev = max(0.0, (w4 - w1) / 3)
    print(
        f"[{label}] compile={compile_s:.1f}s p50_wall={p50:.3f}s "
        f"device_program={dev:.3f}s tunnel/host={p50 - dev:.3f}s",
        flush=True,
    )
    return p50, dev


def main():
    print("backend:", jax.default_backend())
    codec_cfg, iface = bench.build_iface()

    sig10 = bench.make_sig(codec_cfg, 10.0)
    sig60 = bench.make_sig(codec_cfg, 60.0)

    # control first: the 10 s b=2 program (the headline config) — same
    # process, so tunnel weather is shared with the 60 s reading
    p50_10, dev_10 = chained_device_time(iface, sig10, 2, "10s b=2 (control)")
    p50_60, dev_60 = chained_device_time(iface, sig60, 1, "60s b=1 (long-form)")

    print(
        f"\naudio_s/s: 10s-b2 {20.0 / p50_10:.1f} (device-only "
        f"{20.0 / dev_10:.1f}) | 60s-b1 {60.0 / p50_60:.1f} (device-only "
        f"{60.0 / dev_60:.1f})"
    )
    print(
        f"device scale factor: {dev_60 / dev_10:.2f}x for 3.0x the audio "
        f"(linear => 3.0; >3 = sublinear device stage, <3 = device fine, "
        f"gap is tunnel/transfer)"
    )
    print(
        f"tunnel/host overhead: 10s-b2 {p50_10 - dev_10:.3f}s vs 60s-b1 "
        f"{p50_60 - dev_60:.3f}s (int16 waveform bytes: "
        f"{2 * 20 * codec_cfg.sample_rate / 2**20:.1f} MB vs "
        f"{2 * 60 * codec_cfg.sample_rate / 2**20:.1f} MB)"
    )

    if os.environ.get("BENCH_STAGES", "0") != "1":
        return

    # ---- stage-level differentials (only if the device side is sublinear) —
    # coarse MaskGIT at the long-form internal batch (6,4,861) vs the
    # headline's (2,4,861), chained inside one program each
    from vampnet_tpu.sampling.generate import generate as _generate
    from vampnet_tpu.modules.transformer import position_bias_from_params

    coarse = iface.coarse
    chunk_len = iface.s2t(coarse.chunk_size_s)
    bias = None

    def coarse_loop(nb, label):
        z = jnp.zeros((nb, coarse.n_codebooks, chunk_len), jnp.int32)
        m = jnp.ones_like(z)
        params, cbs = coarse.params, iface._codebooks[: coarse.n_codebooks]

        @jax.jit
        def run(z, key, iters):
            pb = position_bias_from_params(params, coarse.config, chunk_len)

            def fwd(zm, c=None, cmk=None):
                return coarse.model.apply(
                    {"params": params}, zm, cbs, method="forward_codes",
                    position_bias=pb,
                )

            def body(i, zz):
                out = _generate(
                    fwd, jax.random.fold_in(key, i),
                    jnp.where(m.astype(bool), coarse.mask_token, zz), m,
                    coarse.mask_token, sampling_steps=12,
                )
                return out

            return jax.lax.fori_loop(0, iters, body, z).sum()

        key = jax.random.PRNGKey(0)

        def wall(n, reps=2):
            np.asarray(run(z, key, jnp.int32(n)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(run(z, key, jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            return best

        w1, w3 = wall(1), wall(3)
        dev = (w3 - w1) / 2
        print(f"[coarse b={nb} t={chunk_len}] device {dev * 1e3:.1f} ms "
              f"({dev / nb * 1e3:.1f} ms/row)", flush=True)
        return dev

    coarse_loop(2, "headline")
    coarse_loop(6, "long-form")


if __name__ == "__main__":
    main()
