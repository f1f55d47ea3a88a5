"""Training-step tests: loss behavior, LoRA-only updates, sharded execution."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.modules import LMConfig, VampNetLM
from vampnet_tpu.modules.lora import lora_param_filter
from vampnet_tpu.parallel import lm_param_specs, make_mesh, opt_state_specs, zero1_specs
from vampnet_tpu.train import TrainState, make_optimizer, make_train_step
from vampnet_tpu.train.scheduler import noam_schedule

CODEC_CFG = CodecConfig(
    sample_rate=16000, encoder_dim=16, encoder_rates=(2, 4, 4),
    decoder_dim=128, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=64, codebook_dim=4,
)
LM_CFG = LMConfig(
    n_heads=4, n_layers=2, n_codebooks=4, latent_dim=4,
    embedding_dim=64, vocab_size=64, dropout=0.1,
)


def _setup(lm_cfg=LM_CFG):
    codec = LAC(CODEC_CFG)
    lm = VampNetLM(lm_cfg)
    audio = jnp.zeros((2, CODEC_CFG.hop_length * 16, 1))
    codec_params = codec.init(jax.random.PRNGKey(0), audio)["params"]
    codes0 = jnp.zeros((1, lm_cfg.n_codebooks, 16), jnp.int32)
    cbs = codec.apply({"params": codec_params}, method="codebook_tables")[
        : lm_cfg.n_codebooks
    ]
    lm_params = lm.init(jax.random.PRNGKey(1), codes0, cbs, method="forward_codes")["params"]
    return codec, codec_params, lm, lm_params, cbs, audio


def test_gather_form_ce_matches_dense_onehot_formula():
    """loss_and_metrics' gather-form CE == the reference's dense
    onehot/log_softmax formula (reference train.py:268-278 with label
    smoothing 0.1), in value AND gradient."""
    from vampnet_tpu.train.step import loss_and_metrics
    from vampnet_tpu.util import codebook_flatten

    b, t, c, v = 2, 6, 3, 40
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (b, t, c, v)) * 3.0
    target = jax.random.randint(jax.random.PRNGKey(1), (b, c, t), 0, v)
    flat_mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (b, t * c)).astype(
        jnp.int32
    )
    r = jnp.asarray([0.2, 0.7])
    ls = 0.1

    def dense(lg):
        lf = lg.reshape(b, t * c, v)
        lp = jax.nn.log_softmax(lf, axis=-1)
        smoothed = jax.nn.one_hot(codebook_flatten(target), v) * (1 - ls) + ls / v
        ce = -(smoothed * lp).sum(-1)
        w = flat_mask.astype(jnp.float32)
        return (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

    def gather(lg):
        return loss_and_metrics(lg, target, flat_mask, r, label_smoothing=ls)[0]

    l_d, g_d = jax.value_and_grad(dense)(logits)
    l_g, g_g = jax.value_and_grad(gather)(logits)
    np.testing.assert_allclose(float(l_d), float(l_g), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_g), atol=1e-6)


def test_noam_schedule_matches_reference_formula():
    sch = noam_schedule(1280, factor=2.0, warmup=10000)
    for step in [1, 100, 10000, 50000]:
        expected = 2.0 * (1280 ** -0.5) * min(step ** -0.5, step * 10000 ** -1.5)
        np.testing.assert_allclose(float(sch(jnp.asarray(step))), expected, rtol=1e-6)


def test_train_step_decreases_loss():
    codec, codec_params, lm, lm_params, cbs, _ = _setup()
    audio = jax.random.normal(jax.random.PRNGKey(5), (2, CODEC_CFG.hop_length * 16, 1)) * 0.1
    opt = make_optimizer(LM_CFG.embedding_dim, factor=0.5, warmup=10)
    state = TrainState(lm_params, opt.init(lm_params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(lm, codec, opt))
    losses = []
    for i in range(12):
        state, metrics = step(state, codec_params, cbs, audio, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert np.mean(losses[-3:]) < losses[0]  # same batch -> loss must fall
    assert all(np.isfinite(losses))
    assert "accuracy-0.0-0.5/top1/masked" in metrics


def test_adam_lowmem_fp32_matches_optax_scale_by_adam():
    from vampnet_tpu.train.step import _scale_by_adam_lowmem

    params = {"a": jnp.linspace(-1, 1, 24).reshape(4, 6),
              "b": jnp.full((3,), 0.5)}
    ours = _scale_by_adam_lowmem(0.9, 0.999, 1e-8, jnp.float32)
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    s_ours, s_ref = ours.init(params), ref.init(params)
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, k = jax.random.split(key)
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(k, p.shape), params
        )
        u_ours, s_ours = ours.update(grads, s_ours)
        u_ref, s_ref = ref.update(grads, s_ref)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            u_ours, u_ref,
        )


def test_train_step_with_bf16_adam_state():
    """state_dtype="bfloat16" (the AdamW.state_dtype knob): moments stored
    bf16, same state tree structure (ZeRO-1 specs bind), one update stays
    close to the fp32 optimizer, and loss still falls."""
    codec, codec_params, lm, lm_params, cbs, _ = _setup()
    audio = jax.random.normal(jax.random.PRNGKey(5), (2, CODEC_CFG.hop_length * 16, 1)) * 0.1
    opt32 = make_optimizer(LM_CFG.embedding_dim, factor=0.5, warmup=10)
    opt16 = make_optimizer(
        LM_CFG.embedding_dim, factor=0.5, warmup=10, state_dtype="bfloat16"
    )

    st16 = opt16.init(lm_params)
    dtypes = {x.dtype for x in jax.tree_util.tree_leaves(st16)
              if hasattr(x, "dtype") and x.ndim > 0}
    assert jnp.dtype(jnp.bfloat16) in dtypes

    # identical tree structure => the ZeRO-1 / opt-state spec machinery binds
    specs = lm_param_specs(lm_params)
    mspecs = zero1_specs(specs, lm_params, dp_size=4)
    opt_state_specs(st16, mspecs)
    assert jax.tree_util.tree_structure(st16) == jax.tree_util.tree_structure(
        opt32.init(lm_params)
    )

    def run(opt, n=8):
        state = TrainState(lm_params, opt.init(lm_params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(lm, codec, opt))
        losses = []
        for _ in range(n):
            state, metrics = step(state, codec_params, cbs, audio, jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
        return state, losses

    s16, losses16 = run(opt16)
    s32, losses32 = run(opt32)
    assert np.mean(losses16[-3:]) < losses16[0]
    # the FIRST update is computed from fp32 moments before they are rounded
    # to bf16 on store, so step-1 params must match the fp32 optimizer's
    s16_1, _ = run(opt16, n=1)
    s32_1, _ = run(opt32, n=1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5),
        s16_1.params, s32_1.params,
    )
    # after 8 steps the trajectories stay close (empirical bound: bf16
    # moment rounding drift is chaotic, so the exact value shifts with any
    # change to loss/gradient rounding; warmup=10 ramps the LR ~1000x
    # faster than production's 10k-step warmup, so this is a stress bound)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s16.params, s32.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-2


def test_lora_only_training_freezes_base():
    cfg = LMConfig(**{**LM_CFG.__dict__, "lora_r": 2})
    codec, codec_params, lm, lm_params, cbs, _ = _setup(cfg)
    audio = jax.random.normal(jax.random.PRNGKey(5), (2, CODEC_CFG.hop_length * 16, 1)) * 0.1
    filt = lora_param_filter(lm_params)
    opt = make_optimizer(cfg.embedding_dim, factor=50.0, warmup=10, lora_filter=filt)
    state = TrainState(lm_params, opt.init(lm_params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(lm, codec, opt))
    state, _ = step(state, codec_params, cbs, audio, jax.random.PRNGKey(0))
    state, _ = step(state, codec_params, cbs, audio, jax.random.PRNGKey(1))

    import flax.traverse_util as tu

    before = tu.flatten_dict(lm_params)
    after = tu.flatten_dict(state.params)
    changed = {k for k in before if not np.array_equal(np.asarray(before[k]), np.asarray(after[k]))}
    assert changed, "lora params must update"
    assert all(k[-1] in ("lora_a", "lora_b") for k in changed), f"base params changed: {changed}"


def test_sharded_train_step_matches_single_device():
    codec, codec_params, lm, lm_params, cbs, _ = _setup()
    audio = jax.random.normal(jax.random.PRNGKey(5), (4, CODEC_CFG.hop_length * 16, 1)) * 0.1
    opt = make_optimizer(LM_CFG.embedding_dim, factor=2.0, warmup=10)
    key = jax.random.PRNGKey(0)

    # single device
    state0 = TrainState(lm_params, opt.init(lm_params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(lm, codec, opt))
    state1, m1 = step(state0, codec_params, cbs, audio, key)

    # 8-device dp*tp mesh
    mesh = make_mesh(n_devices=8, tp=2)
    specs = lm_param_specs(lm_params)
    mspecs = zero1_specs(specs, lm_params, dp_size=4)
    opt_state = opt.init(lm_params)
    opt_specs = opt_state_specs(opt_state, mspecs)
    sh = lambda tree: jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), tree)
    state_sh = TrainState(sh(specs), sh(opt_specs), NamedSharding(mesh, P()))
    state_d = TrainState(
        jax.device_put(lm_params, state_sh.params),
        jax.device_put(opt_state, state_sh.opt_state),
        jax.device_put(jnp.zeros((), jnp.int32), state_sh.step),
    )
    rep = NamedSharding(mesh, P())
    step_sh = jax.jit(
        make_train_step(lm, codec, opt),
        in_shardings=(state_sh, rep, rep, NamedSharding(mesh, P("dp", None, None)), rep),
        out_shardings=(state_sh, rep),
    )
    state2, m2 = step_sh(
        state_d,
        jax.device_put(codec_params, rep),
        jax.device_put(cbs, rep),
        jax.device_put(audio, NamedSharding(mesh, P("dp", None, None))),
        jax.device_put(key, rep),
    )
    # loss must match the single-device run closely
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-3)
    # updated params agree almost everywhere (Adam's 1/sqrt(v) amplifies tiny
    # bf16 reduction-order differences to lr magnitude on a few elements)
    a = jax.tree_util.tree_leaves(state1.params)
    b = jax.tree_util.tree_leaves(state2.params)
    total = ok = 0
    for x, y in zip(a, b):
        x, y = np.asarray(x), np.asarray(y)
        close = np.isclose(x, y, atol=2e-3, rtol=2e-2)
        ok += close.sum()
        total += close.size
    assert ok / total > 0.99, f"only {ok/total:.4%} of params match"


def test_remat_matches_unrematted_gradients():
    """remat=True (gradient checkpointing) must be numerically inert: same
    param tree, same logits, same gradients — only the memory/compute
    schedule changes."""
    import dataclasses

    codec, codec_params, lm, lm_params, cbs, audio = _setup()
    lm_remat = VampNetLM(dataclasses.replace(LM_CFG, remat=True))
    codes = jnp.array(
        np.random.default_rng(0).integers(0, 64, (2, 4, 16)), jnp.int32
    )

    def loss(model, params):
        logits = model.apply(
            {"params": params}, codes, cbs, method="forward_codes"
        )
        return jnp.mean(jax.nn.log_softmax(logits) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(lm, p))(lm_params)
    l1, g1 = jax.value_and_grad(lambda p: loss(lm_remat, p))(lm_params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (k0, a), (k1, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        assert str(k0) == str(k1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6)


def test_encode_microbatch_matches_full_encode():
    """lax.map'd codec encode (memory lever for big batches) must be
    numerically inert: identical metrics and updated params."""
    codec, codec_params, lm, lm_params, cbs, audio = _setup()
    opt = make_optimizer(LM_CFG.embedding_dim)
    state0 = TrainState(lm_params, opt.init(lm_params), jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(5)

    step_full = jax.jit(make_train_step(lm, codec, opt))
    step_mb = jax.jit(make_train_step(lm, codec, opt, encode_microbatch=1))
    s1, m1 = step_full(state0, codec_params, cbs, audio, key)
    s2, m2 = step_mb(state0, codec_params, cbs, audio, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_sharded_train_step_with_remat_runs():
    """remat (gradient checkpointing) composed with the dp/tp/ZeRO-1 sharded
    step — the production big-batch configuration — must trace and execute."""
    import dataclasses

    cfg = dataclasses.replace(LM_CFG, remat=True)
    codec, codec_params, lm, lm_params, cbs, _ = _setup(cfg)
    audio = jax.random.normal(jax.random.PRNGKey(5), (4, CODEC_CFG.hop_length * 16, 1)) * 0.1
    opt = make_optimizer(cfg.embedding_dim, warmup=10)
    mesh = make_mesh(n_devices=8, tp=2)
    specs = lm_param_specs(lm_params)
    mspecs = zero1_specs(specs, lm_params, dp_size=4)
    opt_state = opt.init(lm_params)
    opt_specs = opt_state_specs(opt_state, mspecs)
    sh = lambda tree: jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), tree)
    state_sh = TrainState(sh(specs), sh(opt_specs), NamedSharding(mesh, P()))
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp", None, None))
    state = TrainState(
        jax.device_put(lm_params, state_sh.params),
        jax.device_put(opt_state, state_sh.opt_state),
        jax.device_put(jnp.zeros((), jnp.int32), state_sh.step),
    )
    step = jax.jit(
        make_train_step(lm, codec, opt, encode_microbatch=2),
        in_shardings=(state_sh, rep, rep, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )
    state, metrics = step(
        state,
        jax.device_put(codec_params, rep),
        jax.device_put(cbs, rep),
        jax.device_put(audio, batch_sh),
        jax.device_put(jax.random.PRNGKey(0), rep),
    )
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
