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

    audio_np = np.asarray(iface._preprocess(sig).samples).transpose(0, 2, 1)
    # transfer_dtype="int16" above: the program's input arg is PCM16, so the
    # chain carry must be PCM16 too
    audio_np = np.round(np.clip(audio_np, -1.0, 1.0) * 32767.0).astype(np.int16)
    audio_dev = jnp.asarray(audio_np)
    params_ = (
        iface.codec_params, iface.coarse.params, iface.c2f.params,
        iface._codebooks,
    )

    # params as explicit jit ARGS — closed over, they materialize as dense
    # IR literals (~1.3 GB module, scratch/probe_payload_size.py) and the
    # remote-compile service rejects the body (HTTP 413 / broken pipe)
    @jax.jit
    def chained(ps, audio, key, iters):
        cp_, co_, c2_, cb_ = ps

        def body(i, a):
            wav = fn(
                cp_, co_, c2_, cb_, a, jax.random.fold_in(key, i),
                jnp.float32(1.0), jnp.int32(0), jnp.int32(0),
                jnp.float32(1.0), jnp.float32(10.5), jnp.float32(0.0),
                jnp.float32(1.0),
            )
            if wav.dtype == jnp.int16:
                wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
            wav = jnp.clip(wav[0:1], -1.0, 1.0)
            if a.dtype == jnp.int16:  # match the carry to the input
                wav = jnp.round(wav * 32767.0).astype(jnp.int16)
            return wav

        out = jax.lax.fori_loop(0, iters, body, audio)
        return jnp.sum(out.astype(jnp.float32))

    key_ = jax.random.PRNGKey(3)

    def wall_iters(n, reps=2):
        # the chained compile is still the service's biggest program —
        # retry transient drops; partial compiles are cached
        for attempt in range(4):
            try:
                np.asarray(chained(params_, audio_dev, key_, jnp.int32(n)))
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
            np.asarray(chained(params_, audio_dev, key_, jnp.int32(n)))
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

    if os.environ.get("BENCH_E2E", "1") == "1":
        # control first: the 10 s b=2 program (the headline config) — same
        # process, so tunnel weather is shared with the 60 s reading
        p50_10, dev_10 = chained_device_time(
            iface, sig10, 2, "10s b=2 (control)"
        )
        p50_60, dev_60 = chained_device_time(
            iface, sig60, 1, "60s b=1 (long-form)"
        )

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

    # ---- stage-level differentials via bench.make_stage_loops: the SAME
    # jitted programs as bench.py's device_split fallback, so a run of either
    # warms the other's persistent-cache entries.
    coarse_m, c2f_m, codec_m = bench.make_stage_loops(iface)
    c_len = iface.s2t(iface.coarse.chunk_size_s)
    f_len = iface.s2t(iface.c2f.chunk_size_s)

    # coarse MaskGIT: headline internal batch (1 chunk x b=2) vs long-form
    # (6 chunks x b=1)
    for nb in (2, 6):
        dev = coarse_m(nb)
        print(f"[coarse b={nb} t={c_len}] device {dev * 1e3:.1f} ms "
              f"({dev / nb * 1e3:.1f} ms/row)", flush=True)

    # c2f MaskGIT: headline (4 chunks x b=2 = 8) vs long-form (20 x b=1)
    for nb in (8, 20):
        dev = c2f_m(nb)
        print(f"[c2f b={nb} t={f_len}] device {dev * 1e3:.1f} ms "
              f"({dev / nb * 1e3:.1f} ms/row)", flush=True)

    # codec roundtrip: headline (10 s, decode b=2) vs long-form (60 s, b=1)
    for seconds, dec_b in ((10.0, 2), (60.0, 1)):
        dev = codec_m(seconds, dec_b=dec_b)
        print(f"[codec roundtrip {seconds:g}s dec_b={dec_b}] device "
              f"{dev * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
