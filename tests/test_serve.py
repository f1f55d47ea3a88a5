"""Serving-stack tests: continuous batching engine, OSC protocol + unloop
bridge over real UDP sockets, app vamp core, token telephone state machine."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.serve import VampEngine, VampRequest
from vampnet_tpu.serve.osc import (
    Dispatcher,
    OSCClient,
    OSCServer,
    decode_message,
    encode_message,
)

CODEC_CFG = CodecConfig(
    sample_rate=8000, encoder_dim=8, encoder_rates=(2, 4, 4),
    decoder_dim=64, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=32, codebook_dim=4,
)
COARSE_CFG = LMConfig(
    n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
    embedding_dim=32, vocab_size=32, dropout=0.0,
)
C2F_CFG = LMConfig(
    n_heads=2, n_layers=1, n_codebooks=4, n_conditioning_codebooks=2,
    latent_dim=4, embedding_dim=32, vocab_size=32, dropout=0.0,
)


@pytest.fixture(scope="module")
def interface():
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 8), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim))
        return model.init(jax.random.PRNGKey(seed), codes, cbs, method="forward_codes")["params"]

    return Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=COARSE_CFG, coarse_params=init_lm(COARSE_CFG, 1),
        c2f_cfg=C2F_CFG, c2f_params=init_lm(C2F_CFG, 2),
        coarse_chunk_size_s=0.2, coarse2fine_chunk_size_s=0.1,
    )


def _sig(seconds=0.3, sr=8000, freq=220.0):
    t = np.arange(int(seconds * sr)) / sr
    return AudioSignal(
        (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, None, :], sr
    )


# ---------------- engine ----------------


def test_engine_single_request(interface):
    eng = VampEngine(interface, max_wait_ms=1.0)
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))
    out = eng.vamp(VampRequest(codes=codes, mask=mask, seed=1, sampling_steps=2), timeout=120)
    assert out.shape == codes.shape
    assert (out != interface.coarse.mask_token).all()
    eng.close()


def test_engine_batches_concurrent_heterogeneous(interface):
    eng = VampEngine(interface, max_wait_ms=200.0, max_batch=4)
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))
    # different temperatures/seeds but same static config -> one device batch
    futs = [
        eng.submit(VampRequest(
            codes=codes, mask=mask, seed=i, temperature=0.8 + 0.2 * i,
            sampling_steps=2,
        ))
        for i in range(3)
    ]
    outs = [f.result(timeout=240) for f in futs]
    for o in outs:
        assert o.shape == codes.shape
    assert eng.stats["requests"] == 3
    assert eng.stats["batched_requests"] >= 2, "requests should share a batch"
    eng.close()


def test_engine_mixed_static_configs(interface):
    eng = VampEngine(interface, max_wait_ms=200.0, max_batch=4)
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))
    f1 = eng.submit(VampRequest(codes=codes, mask=mask, sampling_steps=2))
    f2 = eng.submit(VampRequest(codes=codes, mask=mask, sampling_steps=3))
    assert f1.result(240).shape == codes.shape
    assert f2.result(240).shape == codes.shape
    eng.close()


# ---------------- OSC ----------------


def test_osc_encode_decode_roundtrip():
    msg = encode_message("/process", [1, "vampnet", "/tmp/a.wav", 3.5, True, b"xy"])
    addr, args = decode_message(msg)
    assert addr == "/process"
    assert args[0] == 1 and args[1] == "vampnet" and args[2] == "/tmp/a.wav"
    assert abs(args[3] - 3.5) < 1e-6 and args[4] is True and args[5] == b"xy"


def test_osc_server_client_udp():
    got = []
    done = threading.Event()
    disp = Dispatcher()
    disp.map("/hello", lambda addr, *args: (got.append((addr, args)), done.set()))
    server = OSCServer(("127.0.0.1", 0), disp)
    server.start()
    client = OSCClient("127.0.0.1", server.address[1])
    client.send_message("/hello", [42, "world"])
    assert done.wait(timeout=5)
    assert got[0] == ("/hello", (42, "world"))
    server.shutdown()


# ---------------- app core ----------------


def test_vamp_core(interface):
    from vampnet_tpu.serve.app import PRESETS, vamp_core

    sig = _sig(0.3)
    res = vamp_core(
        interface, (sig.sample_rate, sig.samples[0, 0]), seed=7,
        sampling_steps=2, batch_size=2, **{
            k: v for k, v in PRESETS["medium variation"].items()
            if k in ("periodic_p", "n_mask_codebooks", "dropout")
        },
    )
    assert len(res.variations) == 2
    sr, wav = res.variations[0]
    assert sr == 8000 and wav.ndim == 1 and len(wav) > 0
    assert res.seed == 7
    assert res.mask.shape[0] == 2


def test_vamp_core_requires_audio(interface):
    from vampnet_tpu.serve.app import vamp_core

    with pytest.raises(ValueError, match="no input audio"):
        vamp_core(interface, None)


# ---------------- unloop bridge over real UDP ----------------


def test_unloop_bridge_roundtrip(interface, tmp_path):
    from vampnet_tpu.serve.unloop import UnloopBridge

    results = []
    logs = []
    done = threading.Event()
    # "Max side" server receives bridge messages
    max_disp = Dispatcher()
    max_disp.map("/process-result", lambda a, *r: (results.append(r), done.set()))
    max_disp.map("/log", lambda a, *r: logs.append(r))
    max_disp.set_default_handler(lambda a, *r: None)
    max_server = OSCServer(("127.0.0.1", 0), max_disp)
    max_server.start()

    bridge = UnloopBridge(
        ip="127.0.0.1", s_port=max_server.address[1], r_port=0,
        interface=interface, out_dir=tmp_path,
    )
    server = bridge.osc_manager.make_server()
    server.start()

    wav_path = tmp_path / "loop.wav"
    _sig(0.3, sr=48000, freq=330).write(wav_path)

    # the Max patch's 18-argument /process message (client.py:119-135)
    client = OSCClient("127.0.0.1", server.address[1])
    client.send_message("/process", [
        "q1", "vampnet", str(wav_path), "default", 5, 0.0, 3,
        200,  # looplength_ms
        1, 0.15, 8, 2, 0, 2, 1.0, 0.0, 0, 1,
    ])
    assert done.wait(timeout=300), "no /process-result received"
    q_id, *files = results[0]
    assert q_id == "q1" and len(files) == 2
    for f in files:
        out = AudioSignal(f)
        assert out.sample_rate == 48000
        assert out.length > 0
    server.shutdown()
    max_server.shutdown()


def test_unloop_heartbeat(interface, tmp_path):
    from vampnet_tpu.serve.unloop import UnloopBridge

    beats = []
    done = threading.Event()
    max_disp = Dispatcher()
    max_disp.map("/heartbeat", lambda a, *r: (beats.append(r), done.set()))
    max_disp.set_default_handler(lambda a, *r: None)
    max_server = OSCServer(("127.0.0.1", 0), max_disp)
    max_server.start()

    bridge = UnloopBridge(
        ip="127.0.0.1", s_port=max_server.address[1], r_port=0,
        interface=interface, out_dir=tmp_path,
    )
    server = bridge.osc_manager.make_server()
    server.start()
    OSCClient("127.0.0.1", server.address[1]).send_message("/heartbeat", "ping")
    assert done.wait(timeout=10)
    assert beats[0] == ("pong",)
    server.shutdown()
    max_server.shutdown()


# ---------------- token telephone ----------------


def test_tt_trigger_and_release():
    from vampnet_tpu.serve.token_telephone import State, check_if_record

    st = State(sample_rate=8000, duration=1.0, hold_seconds=0.05)
    loud = np.random.default_rng(0).normal(0, 0.5, 256)
    quiet = np.zeros(256) + 1e-5

    check_if_record(st, loud)
    assert st.recording and st.record_ramp_in
    st.record_ramp_in = False

    # quiet block starts the hold period; after hold expires, release fires
    check_if_record(st, quiet)
    assert st.cur_hold_time is not None
    time.sleep(0.06)
    released = []
    check_if_record(st, quiet, on_release_callback=lambda s: released.append(True))
    assert st.record_ramp_out and st.input_ready and released


def test_tt_looper_block_roundtrip():
    from vampnet_tpu.serve.token_telephone import State, looper_process_block

    st = State(sample_rate=8000, blocksize=64, duration=0.5)
    st.loopbuf[:, :] = 0.25  # pretend there's a loop
    block = np.zeros((4, 64))
    out = looper_process_block(st, block)
    assert out.shape == (4, 64)
    np.testing.assert_allclose(out, 0.25)  # playing the loop
    assert st.pos == 64


def test_tt_telephone_step(interface):
    from vampnet_tpu.serve.token_telephone import State, telephone_step

    st = State(sample_rate=8000, duration=0.3)
    st.looper_in[:] = 0.1 * np.sin(
        2 * np.pi * 220 * np.arange(st.looper_in.shape[1]) / 8000
    )
    st.input_ready = True

    calls = []

    def fake_vamp(sig):
        calls.append(sig)
        return sig

    next_ch = telephone_step(st, fake_vamp)
    assert next_ch == 1 and st.tt_cur_ch == 1
    assert st.recording_locked  # locked until the cycle returns to the input channel
    assert len(calls) == 1
    assert np.abs(st.loopbuf[1]).sum() > 0  # vamped audio landed in channel 1
    # complete the cycle -> unlock
    for _ in range(3):
        telephone_step(st, fake_vamp)
    assert not st.recording_locked


def test_tt_render_frame_states():
    """The ported terminal UI (reference tt.py:421-530 draw_looper) as a pure
    frame: assert the rendered text for known States."""
    from vampnet_tpu.serve.token_telephone import (
        UI_COLS,
        UI_ROWS,
        State,
        render_frame,
    )

    st = State(sample_rate=8000, duration=1.0)
    st.rms_db = -20.0

    rows = render_frame(st)
    assert len(rows) == UI_ROWS and all(len(r) == UI_COLS for r in rows)
    frame = "\n".join(rows)
    assert "token telephone" in rows[1]
    assert "make a sound" in frame and "record" in frame
    assert "-20.0dB" in frame
    # rms -20 dB crosses the -25 dB trigger: bar shows '#' above threshold
    assert "#" in "".join(r[3] for r in rows)
    # timeline with playhead at the left edge
    assert rows[UI_ROWS - 1].strip().startswith("|v")
    # idle channel badges
    assert ". 1 ." in frame and ". 4 ." in frame

    # playhead advances with pos
    st.pos = st.loopbuf.shape[1] // 2
    mid_frame = render_frame(st)[UI_ROWS - 1]
    assert mid_frame.index("v") > UI_COLS // 3

    # recording state
    st.recording = True
    st.rec_time = 0.25
    frame = "\n".join(render_frame(st))
    assert "recording" in frame and "0.8s left" in frame

    # locked state: countdown until the visitor's channel comes around again
    st.recording = False
    st.recording_locked = True
    st.input_channel, st.tt_cur_ch, st.pos = 2, 0, 0
    st.token_telephone_processing = True
    frame = "\n".join(render_frame(st))
    assert "please wait" in frame and "3.0s" in frame and "for your turn :)" in frame
    # the active channel badge (tt_cur_ch=0 -> badge "1") is highlighted
    assert "# 1 #" in frame and ". 2 ." in frame


def test_tt_audio_callback_headless():
    """Drive run()'s stream callback (make_audio_callback) with synthetic
    int16 buffers — the full record->release->input_ready path with no
    sounddevice/hardware (reference tt.py:533-571)."""
    from vampnet_tpu.serve.token_telephone import State, make_audio_callback

    st = State(sample_rate=8000, blocksize=64, duration=0.5, hold_seconds=0.02)
    released = []
    cb = make_audio_callback(st, on_release_callback=lambda s: released.append(True))

    frames = 64
    out = np.zeros((frames, st.num_channels), np.int16)

    # silence passes through untouched and does not trigger
    cb(np.zeros((frames, st.num_channels), np.int16), out, frames, None, None)
    assert not st.recording and not np.any(out)

    # loud input triggers recording and is mixed into looper_in
    rng = np.random.default_rng(0)
    loud = (rng.normal(0, 0.4, (frames, st.num_channels)) * 32767 * 0.5).astype(
        np.int16
    )
    cb(loud, out, frames, None, None)
    assert st.recording
    assert np.abs(st.looper_in).sum() > 0

    # quiet (but nonzero) input starts the hold; after hold expires -> release
    quiet = np.ones((frames, st.num_channels), np.int16)
    cb(quiet, out, frames, None, None)
    time.sleep(0.03)
    cb(quiet, out, frames, None, None)
    assert released and st.input_ready and not st.recording

    # playback: the loop buffer reaches outdata as int16
    st.loopbuf[:, :] = 0.25
    cb(quiet, out, frames, None, None)
    assert np.all(np.abs(out.astype(np.int32) - int(0.25 * 32767)) <= 1)


def test_build_demo_wiring_with_mock_gradio(interface, monkeypatch):
    """Execute the gradio UI construction with a mock module: catches runtime
    errors in the wiring and verifies the named API endpoints exist."""
    import sys
    from unittest import mock

    gr = mock.MagicMock()
    api_names = []

    class FakeComponent(mock.MagicMock):
        def click(self, *a, **kw):
            if "api_name" in kw:
                api_names.append(kw["api_name"])
            return mock.MagicMock()

    gr.Button.side_effect = lambda *a, **kw: FakeComponent()
    monkeypatch.setitem(sys.modules, "gradio", gr)

    from vampnet_tpu.serve.app import build_demo

    demo = build_demo(interface)
    assert gr.Blocks.called
    assert "vamp" in api_names and "vamp_1" in api_names  # reference app.py:710 + unloop target
    # UI components constructed
    assert gr.Slider.call_count >= 10
    assert gr.Dropdown.called


def test_engine_warmup(interface):
    eng = VampEngine(interface, max_wait_ms=100.0, max_batch=4)
    eng.warmup(batch_sizes=(1, 2), sampling_steps=2)
    assert eng.stats["requests"] >= 3  # 1 + 2 warmup requests went through
    eng.close()


def test_engine_request_deterministic_solo_vs_batched(interface):
    """A request's tokens must depend only on its own seed — identical
    whether it ran alone or shared a device batch (per-row key streams)."""
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))

    def solo(seed, temp):
        eng = VampEngine(interface, max_wait_ms=1.0)
        try:
            return eng.vamp(
                VampRequest(codes=codes, mask=mask, seed=seed,
                            temperature=temp, sampling_steps=2),
                timeout=240,
            )
        finally:
            eng.close()

    solo_outs = [solo(7, 1.0), solo(13, 0.9)]

    eng = VampEngine(interface, max_wait_ms=500.0, max_batch=4)
    try:
        futs = [
            eng.submit(VampRequest(codes=codes, mask=mask, seed=7,
                                   temperature=1.0, sampling_steps=2)),
            eng.submit(VampRequest(codes=codes, mask=mask, seed=13,
                                   temperature=0.9, sampling_steps=2)),
        ]
        batched_outs = [f.result(timeout=240) for f in futs]
        assert eng.stats["batched_requests"] >= 2, "must actually share a batch"
    finally:
        eng.close()

    np.testing.assert_array_equal(solo_outs[0], batched_outs[0])
    np.testing.assert_array_equal(solo_outs[1], batched_outs[1])
    # different seeds genuinely differ
    assert not np.array_equal(batched_outs[0], batched_outs[1])


def test_engine_pipelined_batches(interface):
    """More sequential batches than pipeline_depth: dispatch/collect overlap
    and the bounded in-flight queue's backpressure must not reorder, drop, or
    cross-contaminate results."""
    eng = VampEngine(interface, max_wait_ms=1.0, max_batch=1, pipeline_depth=2)
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))
    seeds = [7, 8, 7, 8, 7]
    try:
        futs = [
            eng.submit(VampRequest(codes=codes, mask=mask, seed=s, sampling_steps=2))
            for s in seeds
        ]
        outs = [f.result(timeout=240) for f in futs]
    finally:
        eng.close()
    for o in outs:
        assert o.shape == codes.shape
    # equal seeds -> identical tokens, across different pipelined batches
    np.testing.assert_array_equal(outs[0], outs[2])
    np.testing.assert_array_equal(outs[2], outs[4])
    np.testing.assert_array_equal(outs[1], outs[3])
    assert not np.array_equal(outs[0], outs[1])


def test_engine_dispatch_error_propagates(interface):
    """A malformed request must fail ITS future, not kill the scheduler."""
    eng = VampEngine(interface, max_wait_ms=1.0)
    codes = np.asarray(interface.encode(_sig()))
    mask = np.asarray(interface.build_mask(jnp.asarray(codes), seed=0))
    bad = VampRequest(codes=codes[:, :1, :], mask=mask, sampling_steps=2)
    try:
        # Future.exception() distinguishes "failed with an error" (returns
        # the exception) from "never resolved" (raises TimeoutError) — a
        # bare pytest.raises would accept the hang too
        exc = eng.submit(bad).exception(timeout=240)
        assert exc is not None
        # the engine must still serve well-formed requests afterwards
        out = eng.vamp(
            VampRequest(codes=codes, mask=mask, seed=1, sampling_steps=2),
            timeout=240,
        )
        assert out.shape == codes.shape
    finally:
        eng.close()


# ---------------- stdlib web app (serve/webapp.py) ----------------


@pytest.fixture(scope="module")
def web_server(interface):
    from vampnet_tpu.serve.webapp import make_server

    server = make_server(interface, port=0)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    yield server.server_address
    server.shutdown()
    server.server_close()
    th.join(timeout=10)


def _http(addr, method, path, body=None, ctype=None):
    import http.client

    conn = http.client.HTTPConnection(*addr, timeout=300)
    headers = {"Content-Type": ctype} if ctype else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    status, resp_ctype = resp.status, resp.getheader("Content-Type")
    conn.close()
    return status, resp_ctype, data


def test_webapp_health_presets_index(web_server):
    import json as _json

    status, ctype, data = _http(web_server, "GET", "/health")
    assert status == 200 and _json.loads(data)["status"] == "ok"

    status, _, data = _http(web_server, "GET", "/presets")
    assert status == 200
    presets = _json.loads(data)
    assert "medium variation" in presets

    status, ctype, data = _http(web_server, "GET", "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"/api/vamp" in data

    status, _, _ = _http(web_server, "GET", "/nope")
    assert status == 404


def test_webapp_vamp_wav_body_roundtrip(web_server):
    import json as _json

    from vampnet_tpu.serve.webapp import audio_to_wav_bytes, wav_bytes_to_audio

    sig = _sig(0.3)
    wav = audio_to_wav_bytes(sig.sample_rate, sig.samples[0, 0])
    status, ctype, data = _http(
        web_server, "POST",
        "/api/vamp?preset=medium+variation&sampling_steps=2&seed=5&batch_size=2",
        body=wav, ctype="audio/wav",
    )
    assert status == 200, data
    out = _json.loads(data)
    assert out["seed"] == 5 and len(out["variations"]) == 2
    import base64 as _b64

    out_sr, out_wav = wav_bytes_to_audio(_b64.b64decode(out["variations"][0]))
    assert out_sr == out["sample_rate"] and len(out_wav) > 0

    # format=wav returns raw audio
    status, ctype, data = _http(
        web_server, "POST", "/api/vamp?sampling_steps=2&format=wav",
        body=wav, ctype="audio/wav",
    )
    assert status == 200 and ctype == "audio/wav"
    out_sr2, out_wav2 = wav_bytes_to_audio(data)
    assert len(out_wav2) > 0


def test_webapp_vamp_json_body(web_server):
    import base64 as _b64
    import json as _json

    from vampnet_tpu.serve.webapp import audio_to_wav_bytes

    sig = _sig(0.25)
    payload = _json.dumps({
        "audio_b64": _b64.b64encode(
            audio_to_wav_bytes(sig.sample_rate, sig.samples[0, 0])
        ).decode(),
        "sample_rate": sig.sample_rate,
        "sampling_steps": 2,
        "seed": 9,
        "top_p": 0,
    }).encode()
    status, _, data = _http(
        web_server, "POST", "/api/vamp", body=payload, ctype="application/json"
    )
    assert status == 200, data
    out = _json.loads(data)
    assert out["seed"] == 9 and len(out["variations"]) == 2


def test_webapp_errors(web_server):
    import json as _json

    from vampnet_tpu.serve.webapp import audio_to_wav_bytes

    sig = _sig(0.2)
    wav = audio_to_wav_bytes(sig.sample_rate, sig.samples[0, 0])
    # unknown knob -> 400
    status, _, data = _http(
        web_server, "POST", "/api/vamp?bogus_knob=1", body=wav, ctype="audio/wav"
    )
    assert status == 400 and "bogus_knob" in _json.loads(data)["error"]
    # unknown preset -> 400
    status, _, _ = _http(
        web_server, "POST", "/api/vamp?preset=nope", body=wav, ctype="audio/wav"
    )
    assert status == 400
    # garbage body -> 500, server keeps serving
    status, _, _ = _http(
        web_server, "POST", "/api/vamp", body=b"not a wav", ctype="audio/wav"
    )
    assert status == 500
    status, _, _ = _http(web_server, "GET", "/health")
    assert status == 200


def test_webapp_engine_concurrent(interface):
    """Engine-backed server: concurrent HTTP clients' generates merge into
    shared device batches (stats prove batching); unsupported knobs fall
    back to the locked vamp_core path."""
    import base64 as _b64
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    from vampnet_tpu.serve import VampEngine
    from vampnet_tpu.serve.webapp import audio_to_wav_bytes, make_server

    eng = VampEngine(interface, max_batch=8, max_wait_ms=50.0)
    server = make_server(interface, port=0, engine=eng)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        sig = _sig(0.3)
        wav = audio_to_wav_bytes(sig.sample_rate, sig.samples[0, 0])

        def call(seed, extra=""):
            status, _, data = _http(
                server.server_address, "POST",
                f"/api/vamp?sampling_steps=2&seed={seed}&batch_size=1{extra}",
                body=wav, ctype="audio/wav",
            )
            assert status == 200, data
            return _json.loads(data)

        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(call, [11, 12, 13, 14]))
        assert all(len(o["variations"]) == 1 for o in outs)
        assert {o["seed"] for o in outs} == {11, 12, 13, 14}
        assert eng.stats["requests"] >= 4
        assert eng.stats["batched_requests"] > 0

        # deterministic: same seed through the engine path twice
        a, b = call(21), call(21)
        assert a["variations"] == b["variations"]

        # unsupported knob falls back to vamp_core (still succeeds)
        out = call(31, extra="&stretch_factor=2")
        assert len(out["variations"]) == 1
        _b64.b64decode(out["variations"][0])
    finally:
        server.shutdown()
        server.server_close()
        th.join(timeout=10)
        eng.close()
