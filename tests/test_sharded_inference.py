"""Multi-chip inference: Interface.shard over a virtual mesh must reproduce
single-device results (GSPMD propagates tp/dp layouts through generate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.interface import Interface
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.parallel import make_mesh

CODEC_CFG = CodecConfig(
    sample_rate=8000, encoder_dim=8, encoder_rates=(2, 4, 4),
    decoder_dim=64, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=32, codebook_dim=4,
)
COARSE_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=2, latent_dim=4,
    embedding_dim=64, vocab_size=32, dropout=0.0,
)


def _iface():
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]
    model = VampNetLM(COARSE_CFG)
    codes = jnp.zeros((1, 2, 8), jnp.int32)
    cbs = jnp.zeros((2, 32, 4))
    params = model.init(jax.random.PRNGKey(1), codes, cbs, method="forward_codes")["params"]
    return Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=COARSE_CFG, coarse_params=params,
        coarse_chunk_size_s=0.2,
    )


def _sig():
    t = np.arange(2400) / 8000
    return AudioSignal((0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, None, :], 8000)


def test_sharded_vamp_matches_single_device():
    iface = _iface()
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    ref = np.asarray(iface.coarse_vamp(z, mask, seed=3, _sampling_steps=3))

    iface.shard(tp=2)  # 4 dp x 2 tp over the 8 virtual devices
    params_sharding = jax.tree_util.tree_leaves(iface.coarse.params)[0].sharding
    assert hasattr(params_sharding, "mesh")
    out = np.asarray(iface.coarse_vamp(z, mask, seed=3, _sampling_steps=3))
    # same seed + same math (up to reduction order): token streams should
    # be overwhelmingly identical
    agree = (out == ref).mean()
    assert agree > 0.98, f"only {agree:.3f} of tokens agree after sharding"


def test_sharded_params_actually_distributed():
    iface = _iface()
    iface.shard(tp=2)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(iface.coarse.params)
    w1 = flat[("transformer", "layers_0", "feed_forward", "w_1", "kernel")]
    # sharded over tp on the output dim
    assert len(w1.sharding.device_set) >= 2


def test_engine_data_parallel_serving():
    from vampnet_tpu.serve import VampEngine, VampRequest

    iface = _iface()
    iface.shard(tp=1)  # 8-way dp over the virtual devices
    eng = VampEngine(iface, max_wait_ms=200.0, max_batch=8, data_parallel=True)
    z = np.asarray(iface.encode(_sig()))
    mask = np.asarray(iface.build_mask(jnp.asarray(z), seed=0))
    futs = [
        eng.submit(VampRequest(codes=z, mask=mask, seed=i, sampling_steps=2,
                               coarse_only=True))
        for i in range(3)  # 3 requests pad to dp=8 rows on device
    ]
    outs = [f.result(240) for f in futs]
    for o in outs:
        assert o.shape == z.shape
        assert (o != iface.coarse.mask_token).all()
    assert eng.stats["requests"] == 3
    eng.close()


# ---------------- pipeline-parallel placement (SURVEY §2.3 PP) ----------------

C2F_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=4, n_conditioning_codebooks=2,
    latent_dim=4, embedding_dim=64, vocab_size=32, dropout=0.0,
)


def _iface_two_stage():
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]

    def init_lm(cfg, seed):
        model = VampNetLM(cfg)
        codes = jnp.zeros((1, cfg.n_codebooks, 8), jnp.int32)
        cbs = jnp.zeros((cfg.n_codebooks, cfg.vocab_size, cfg.latent_dim))
        return model.init(
            jax.random.PRNGKey(seed), codes, cbs, method="forward_codes"
        )["params"]

    return Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=COARSE_CFG, coarse_params=init_lm(COARSE_CFG, 1),
        c2f_cfg=C2F_CFG, c2f_params=init_lm(C2F_CFG, 2),
        coarse_chunk_size_s=0.2, coarse2fine_chunk_size_s=0.1,
    )


def _two_stage(iface, z, mask):
    zc = iface.coarse_vamp(z, mask, seed=7, _sampling_steps=3)
    zf = iface.coarse_to_fine(zc, mask=mask, seed=11, _sampling_steps=2)
    return np.asarray(zf)


def test_pipeline_placement_slices_and_parity():
    iface = _iface_two_stage()
    z = iface.encode(_sig())
    z = jnp.concatenate([z, jnp.zeros_like(z)], axis=1)[:, :4]  # 4 cbs for c2f
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    ref = _two_stage(iface, z, mask)
    ref_audio = np.asarray(iface.decode(ref).samples)

    iface.shard_pipeline(n_coarse_devices=4)
    devs = jax.devices()
    coarse_set = jax.tree_util.tree_leaves(iface.coarse.params)[0].sharding.device_set
    c2f_set = jax.tree_util.tree_leaves(iface.c2f.params)[0].sharding.device_set
    assert coarse_set == set(devs[:4]), "coarse must live on slice A"
    assert c2f_set == set(devs[4:]), "c2f must live on slice B"
    assert coarse_set.isdisjoint(c2f_set)

    out = _two_stage(iface, z, mask)
    agree = (out == ref).mean()
    assert agree > 0.98, f"only {agree:.3f} of tokens agree under pipeline"
    out_audio = np.asarray(iface.decode(out).samples)
    np.testing.assert_allclose(out_audio, ref_audio, atol=1e-4)


def test_pipeline_default_split_and_e2e_guard():
    iface = _iface_two_stage()
    iface.shard_pipeline()  # default ~3:1 split of the 8 virtual devices
    n_a = len(jax.tree_util.tree_leaves(iface.coarse.params)[0].sharding.device_set)
    n_b = len(jax.tree_util.tree_leaves(iface.c2f.params)[0].sharding.device_set)
    assert n_a + n_b == 8 and n_a == 6 and n_b == 2
    with pytest.raises(AssertionError, match="vamp_e2e"):
        iface.vamp_e2e(_sig(), batch_size=1)


def test_engine_over_pipeline_matches_unplaced():
    from vampnet_tpu.serve import VampEngine, VampRequest

    iface = _iface_two_stage()
    z = np.asarray(iface.encode(_sig()))
    z = np.concatenate([z, np.zeros_like(z)], axis=1)[:, :4]
    mask = np.asarray(iface.build_mask(jnp.asarray(z), seed=0))

    def run_engine():
        eng = VampEngine(iface, max_wait_ms=200.0, max_batch=4)
        futs = [
            eng.submit(VampRequest(codes=z, mask=mask, seed=100 + i,
                                   sampling_steps=2))
            for i in range(3)
        ]
        outs = [f.result(240) for f in futs]
        eng.close()
        return outs

    ref = run_engine()
    iface.shard_pipeline(n_coarse_devices=4)
    outs = run_engine()
    for a, b in zip(ref, outs):
        agree = (a == b).mean()
        assert agree > 0.98, f"engine-over-pipeline diverged: {agree:.3f}"


def test_vamp_full_path_under_pipeline():
    """vamp() (batch expand + feedback + c2f + mask concat) must run when the
    two stages live on disjoint slices — its eager roll/concat ops touch
    arrays from both stages."""
    iface = _iface_two_stage()
    z = iface.encode(_sig())
    z = jnp.concatenate([z, jnp.zeros_like(z)], axis=1)[:, :4]
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    ref, ref_mask = iface.vamp(
        z, mask, batch_size=2, seed=9, _sampling_steps=2, return_mask=True
    )
    ref = np.asarray(ref)

    iface.shard_pipeline(n_coarse_devices=4)
    out, out_mask = iface.vamp(
        z, mask, batch_size=2, seed=9, _sampling_steps=2, return_mask=True
    )
    out = np.asarray(out)
    assert out.shape == ref.shape
    agree = (out == ref).mean()
    assert agree > 0.98, f"vamp under pipeline diverged: {agree:.3f}"
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))


def test_engine_data_parallel_over_pipeline():
    """Engine dp serving composed with pipeline placement: batches shard over
    the coarse slice's dp axis, and the stage boundary reshards onto the c2f
    slice."""
    from vampnet_tpu.serve import VampEngine, VampRequest

    iface = _iface_two_stage()
    z = np.asarray(iface.encode(_sig()))
    z = np.concatenate([z, np.zeros_like(z)], axis=1)[:, :4]
    mask = np.asarray(iface.build_mask(jnp.asarray(z), seed=0))

    iface.shard_pipeline(n_coarse_devices=4)  # dp=4 coarse slice, dp=4 c2f
    eng = VampEngine(iface, max_wait_ms=200.0, max_batch=4, data_parallel=True)
    assert eng.dp == 4
    futs = [
        eng.submit(VampRequest(codes=z, mask=mask, seed=50 + i, sampling_steps=2))
        for i in range(3)  # pads to 4 device rows
    ]
    outs = [f.result(240) for f in futs]
    eng.close()
    for o in outs:
        assert o.shape == z.shape
        assert (o != iface.c2f.mask_token).all()


def test_quantized_interface_shards():
    """int8 param trees (kernel_q/kernel_scale) carry tp partition specs too
    (parallel/partition.py), so the quantize -> shard composition serves."""
    iface = _iface()
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    iface.quantize()
    iface.shard(tp=2)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(iface.coarse.params)
    w1q = flat[("transformer", "layers_0", "feed_forward", "w_1", "kernel_q")]
    assert len(w1q.sharding.device_set) >= 2
    out = np.asarray(iface.coarse_vamp(z, mask, seed=3, _sampling_steps=2))
    assert out.shape == np.asarray(z).shape
    assert (out != iface.coarse.mask_token).all()


def test_quantize_under_pipeline_unwinds_placement():
    """Dropping pipeline mode (quantize/reload) must pull every still-placed
    tree off the stale slices: codec decode after the drop runs against
    consistent placements and the engine's data_parallel precondition fails
    until re-sharded (stale _mesh bug)."""
    iface = _iface_two_stage()
    z = iface.encode(_sig())
    z = jnp.concatenate([z, jnp.zeros_like(z)], axis=1)[:, :4]
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    iface.shard_pipeline(n_coarse_devices=4)
    _two_stage(iface, z, mask)  # commit arrays on both slices

    iface.quantize()
    assert iface._pipeline is False
    assert iface._mesh is None and iface._codec_params_decode is None
    assert iface.coarse.mesh is None and iface.c2f.mesh is None
    out = _two_stage(iface, z, mask)
    audio = iface.decode(out)  # mixed-slice commits would crash here
    assert np.asarray(audio.samples).shape[0] == 1


# ---------------- sequence parallel (ring attention from the product) ----------------


def test_sp_chunkfree_vamp_matches_unsharded_whole_seq():
    """shard(sp=8) + coarse_vamp must equal the same whole-sequence generate
    on one device (xla attention): the sp machinery — ring attention under
    shard_map, GSPMD-sharded sampling — changes the placement, not the
    math. Deterministic regime (tests/test_lockstep_generate.py protocol);
    ring's online-softmax accumulation order still differs from xla's plain
    softmax by ~1e-6, which flips argmax at near-ties (~0.2% of positions at
    this tiny scale), so the gate is overwhelming agreement + exact keeps."""
    import dataclasses

    from vampnet_tpu.sampling import generate as _generate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    # fp32 compute: bit-stable argmax across attention impls
    cfg = dataclasses.replace(COARSE_CFG, compute_dtype="float32")
    model = VampNetLM(cfg)
    t = 2048  # >> the trained-window sizes; 256 tokens/device on the mesh
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 32, (1, 2, t)), jnp.int32)
    cbs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 4))
    params = model.init(
        jax.random.PRNGKey(1), codes, cbs, method="forward_codes"
    )["params"]
    mask = jnp.asarray((rng.random((1, 2, t)) < 0.8).astype(np.int32))

    det = dict(
        temperature=1.0, mask_temperature=0.0, typical_filtering=False,
        sample_cutoff=-1.0, sampler_impl="xla",
    )

    # single-device whole-sequence reference (no chunking, xla attention)
    def forward(zm, c=None, cm=None):
        return model.apply({"params": params}, zm, cbs, method="forward_codes")

    ref = np.asarray(
        _generate(
            forward, jax.random.PRNGKey(0), codes, mask,
            mask_token=cfg.mask_token, sampling_steps=4, **det,
        )
    )

    # product path: Interface.shard(sp=8) -> chunk-free coarse_vamp
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]
    iface = Interface.from_modules(
        codec_cfg=CODEC_CFG, codec_params=codec_params,
        coarse_cfg=cfg, coarse_params=params, coarse_chunk_size_s=0.2,
    )
    iface._codebooks = cbs  # pin the LM tables used by the reference run
    iface.shard(sp=8)
    assert iface.coarse.config.attention_impl == "ring"
    out = np.asarray(
        iface.coarse_vamp(codes, mask, seed=0, _sampling_steps=4, **det)
    )
    assert out.shape == ref.shape
    agree = (out == ref).mean()
    assert agree > 0.99, f"only {agree:.4f} of tokens agree under sp"
    keep = np.asarray(mask) == 0
    np.testing.assert_array_equal(out[keep], np.asarray(codes)[keep])

    # chunked=True still forces the windowed path on the same interface
    windowed = np.asarray(
        iface.coarse_vamp(
            codes, mask, seed=0, _sampling_steps=4, chunked=True, **det
        )
    )
    assert windowed.shape == ref.shape
    assert not np.array_equal(windowed, ref)  # windows see less context


def test_shard_sp_reentry_keeps_nonring_twin():
    """shard(sp=) twice must not adopt the ring LM as the windowed
    (chunked=True) fallback, and a later shard(tp/dp) must restore the
    non-ring coarse LM and clear the sp mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    iface = _iface()
    iface.shard(sp=8)
    iface.shard(sp=8)  # re-shard (e.g. reconfig)
    assert iface.coarse.config.attention_impl == "ring"
    assert iface._coarse_windowed.config.attention_impl != "ring"

    iface.shard(tp=1)  # leave sp: back to the regular attention LM
    assert iface.coarse.config.attention_impl != "ring"
    assert iface._sp_mesh is None


def test_sp_vamp_public_api_end_to_end():
    """Full vamp() through shard(sp=8): coarse goes chunk-free, c2f stays
    windowed; kept (unmasked) positions survive, output is in-vocab."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    iface = _iface()
    iface.shard(sp=8)
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    out = np.asarray(iface.vamp(z, mask, seed=3, _sampling_steps=3))
    assert out.shape == z.shape
    keep = np.asarray(mask) == 0
    np.testing.assert_array_equal(out[keep], np.asarray(z)[keep])
    assert (out >= 0).all() and (out < 32).all()


def test_vamp_microbatched_grouping_invariance():
    """Within-request pipeline microbatching (VERDICT r2 item 7): streaming a
    long request through coarse->c2f in groups must produce EXACTLY the
    tokens of the one-shot run — per-chunk RNG folds global chunk indices
    (row_key_offset), so grouping changes scheduling, never output. Group
    length (2 coarse chunks = 100 tok) is a multiple of the c2f chunk (25),
    so the fine stage windows identically too."""
    iface = _iface_two_stage()
    # 8 coarse chunks of audio
    t_samples = CODEC_CFG.hop_length * 50 * 8
    tt = np.arange(t_samples) / 8000
    sig = AudioSignal(
        (0.5 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)[None, None, :], 8000
    )
    z = iface.encode(sig)
    z = jnp.concatenate([z, jnp.zeros_like(z)], axis=1)[:, :4]
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    seed = np.array([1234], np.uint32)  # array seed -> per-row streams

    kw = dict(_sampling_steps=2, seed=seed)
    one_shot = np.asarray(iface.vamp_microbatched(z, mask, group_chunks=8, **kw))
    assert one_shot.shape == (1, 4, z.shape[-1])

    for g in (1, 2, 4):
        grouped = np.asarray(iface.vamp_microbatched(z, mask, group_chunks=g, **kw))
        np.testing.assert_array_equal(
            grouped, one_shot, err_msg=f"group_chunks={g} changed tokens"
        )

    # and over the real pipeline placement (disjoint mesh slices): bitwise
    # scheduling-only there too
    iface.shard_pipeline(n_coarse_devices=4)
    piped = np.asarray(iface.vamp_microbatched(z, mask, group_chunks=2, **kw))
    agree = (piped == one_shot).mean()
    assert agree > 0.98, f"only {agree:.3f} of tokens agree under pipeline"


# ---------------- sp API contract (VERDICT r3 item 8) ----------------


def test_sp_rejects_fused_sampler_explicitly():
    """Under shard(sp=) the fused Pallas sampler is swapped for the xla
    sampler (per-core pltpu PRNG cannot ride a shard_map). An EXPLICIT
    sampler_impl="fused" must raise, not silently de-shard — the swap is
    documented API contract in shard()'s docstring."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    iface = _iface()
    iface.shard(sp=8)
    z = iface.encode(_sig())
    mask = iface.build_mask(z, periodic_prompt=5, upper_codebook_mask=1, seed=0)
    with pytest.raises(NotImplementedError, match="sampler_impl"):
        iface.coarse_vamp(z, mask, seed=0, _sampling_steps=2, sampler_impl="fused")
    # 'auto' and 'xla' both route to the xla sampler and run
    out = np.asarray(
        iface.coarse_vamp(z, mask, seed=0, _sampling_steps=2, sampler_impl="xla")
    )
    assert out.shape == np.asarray(z).shape


def test_sp_engine_serving_matches_solo():
    """VampEngine in DEFAULT mode over an sp-sharded interface: each request
    batch runs sequence-parallel over the whole mesh, and tokens EXACTLY
    equal the solo sp coarse_vamp with the same per-row seed: the engine
    buckets sp requests on the interface's sp_pad_len grid (not the coarse
    chunk grid), so engine and solo run the same-length generate program —
    chunk-grid pre-padding would change the sequence length and the tokens.
    fp32 compute + deterministic regime keeps the comparison bit-stable."""
    import dataclasses

    from vampnet_tpu.serve import VampEngine, VampRequest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    iface = _iface()
    iface.coarse = type(iface.coarse)(
        dataclasses.replace(iface.coarse.config, compute_dtype="float32"),
        iface.coarse.params, iface.coarse.chunk_size_s, inference_dtype=None,
    )
    iface.shard(sp=8)
    z = np.asarray(iface.encode(_sig()))
    mask = np.asarray(iface.build_mask(jnp.asarray(z), seed=0))

    det = dict(
        temperature=1.0, mask_temperature=0.0, typical_filtering=False,
        sample_cutoff=-1.0,
    )
    solo = {}
    for seed in (3, 4):
        solo[seed] = np.asarray(
            iface.coarse_vamp(
                jnp.asarray(z), jnp.asarray(mask),
                seed=np.array([seed], np.uint32), _sampling_steps=2, **det,
            )
        )

    eng = VampEngine(iface, max_wait_ms=200.0, max_batch=4)
    futs = [
        eng.submit(
            VampRequest(codes=z, mask=mask, seed=s, coarse_only=True,
                        sampling_steps=2, **det)
        )
        for s in (3, 4)
    ]
    outs = [f.result(240) for f in futs]
    eng.close()
    for s, o in zip((3, 4), outs):
        np.testing.assert_array_equal(o, solo[s])


def test_sp_engine_rejects_data_parallel():
    """data_parallel serving needs a dp mesh; an sp interface has none —
    even when a dp/tp shard() happened EARLIER (the sp switch clears the
    stale mesh so this fails loudly instead of mis-sharding)."""
    from vampnet_tpu.serve import VampEngine

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    iface = _iface()
    iface.shard(tp=1)  # leaves a dp mesh behind
    iface.shard(sp=8)
    assert iface._mesh is None
    with pytest.raises(AssertionError, match="data_parallel"):
        VampEngine(iface, data_parallel=True)
