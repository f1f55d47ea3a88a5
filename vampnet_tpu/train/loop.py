"""Training entry point (reference scripts/exp/train.py:538-746), TPU-native.

Differences from the reference by design:
  * one jitted device program per step (codec encode + mask + LM fwd/bwd +
    AdamW/Noam) — no per-step host sync beyond metrics fetch;
  * distribution via a ("dp","tp") jax mesh + GSPMD instead of DDP: batch
    sharded over dp, matmuls optionally over tp, Adam moments ZeRO-1-sharded
    (reference's ZeroRedundancyOptimizer, train.py:588-590);
  * orbax checkpoints with latest/best/Nk tags + adapter-only LoRA trees.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config as cfglib
from .. import mask as pmask
from ..checkpoints import load_codec
from ..codec import LAC
from ..modules import LMConfig, VampNetLM
from ..modules.lora import lora_param_filter
from ..parallel import lm_param_specs, make_mesh, opt_state_specs, zero1_specs
from .checkpoints import CheckpointManager
from .datasets import AudioDataset, AudioLoader, BatchLoader
from .step import TrainState, make_optimizer, make_train_step
from .tracker import Tracker


def build_controller(args, codec_cfg):
    """Sketch2Sound control conditioning (conf/lora/lora-s2s.yml:
    Sketch2SoundController.ctrl_keys)."""
    ctrl_keys = cfglib.bound(args, "Sketch2SoundController", "ctrl_keys", None)
    if not ctrl_keys:
        return None
    from ..control import Sketch2SoundController

    return Sketch2SoundController(
        ctrl_keys=list(ctrl_keys),
        hop_length=codec_cfg.hop_length,
        sample_rate=codec_cfg.sample_rate,
    )


def _encode_microbatch(args, dp: int):
    """Validate the encode_microbatch knob: dp>1 already divides the per-chip
    batch, and lax.map over a dp-sharded axis would serialize devices — the
    option is single-mesh only, and misconfiguration must fail loudly (the
    user set it because the full-batch encode OOMs)."""
    mb = args.get("encode_microbatch")
    if not mb:
        return None
    if dp > 1:
        # dp already divides the per-chip batch (the OOM this knob fights
        # shrinks with it), and lax.map over a dp-sharded axis would
        # serialize devices — drop it, loudly
        import warnings

        warnings.warn(
            f"encode_microbatch={mb} ignored: single-mesh only and dp={dp} "
            "already divides the per-chip encode batch"
        )
        return None
    return int(mb)


def build_lm_config(args, fine_tune: bool = False, controller=None) -> LMConfig:
    g = lambda attr, default: cfglib.bound(args, "VampNet", attr, default)
    ctrl_dims = None
    if controller is not None:
        ctrl_dims = tuple(sorted(controller.ctrl_dims.items()))
    return LMConfig(
        n_heads=g("n_heads", 20),
        n_layers=g("n_layers", 16),
        n_codebooks=g("n_codebooks", 9),
        n_conditioning_codebooks=g("n_conditioning_codebooks", 0),
        latent_dim=g("latent_dim", 8),
        embedding_dim=g("embedding_dim", 1280),
        vocab_size=g("vocab_size", 1024),
        dropout=g("dropout", 0.1),
        lora_r=int(args.get("lora_r", 8)) if fine_tune else 0,
        remat=bool(g("remat", False)),  # gradient checkpointing (big batches)
        ctrl_dims=ctrl_dims,
    )


def build_datasets(args, sample_rate: int):
    def build(scope_name):
        with cfglib.scope(args, scope_name):
            loader = AudioLoader(
                **cfglib.bind_kwargs(args, "AudioLoader", sources=[], relative_path="", shuffle=True)
            )
            return AudioDataset(
                loader,
                sample_rate,
                **cfglib.bind_kwargs(
                    args,
                    "AudioDataset",
                    duration=10.0,
                    loudness_cutoff=-30.0,
                    n_examples=10_000_000,
                    without_replacement=True,
                ),
            )

    return build("train"), build("val")


def train(args: dict, seed: int = 0) -> TrainState:
    save_path = Path(args.get("save_path", "ckpt"))
    fine_tune = bool(args.get("fine_tune", False))
    num_iters = int(args.get("num_iters", 1000))
    batch_size = int(args.get("batch_size", 8))
    val_freq = int(args.get("val_freq", 1000))
    sample_freq = int(args.get("sample_freq", 10000))
    save_iters = list(args.get("save_iters", []))
    num_workers = int(args.get("num_workers", 4))
    grad_clip = float(args.get("grad_clip_val", 5.0))
    label_smoothing = float(args.get("CrossEntropyLoss.label_smoothing", 0.1))
    resume = bool(args.get("resume", False))
    tag = args.get("tag", "latest")
    # training PRNG stream: rbg (TPU hardware RNG, 18.6% faster step) or
    # threefry (jax default). Per-key deterministic either way.
    prng_impl = str(args.get("prng", "rbg"))
    # jax's registered name for threefry is "threefry2x32"; accept the alias
    prng_impl = {"threefry": "threefry2x32"}.get(prng_impl, prng_impl)

    # ----- models -----
    codec_cfg, codec_params = load_codec(args["codec_ckpt"])
    codec = LAC(codec_cfg)
    controller = build_controller(args, codec_cfg)
    lm_cfg = build_lm_config(args, fine_tune=fine_tune, controller=controller)
    lm = VampNetLM(lm_cfg)
    assert lm_cfg.vocab_size == codec_cfg.codebook_size, (
        f"vocab size {lm_cfg.vocab_size} must match codec codebook size "
        f"{codec_cfg.codebook_size}"  # reference train.py:583-585
    )

    codebooks = codec.apply({"params": codec_params}, method="codebook_tables")[
        : lm_cfg.n_codebooks
    ]
    key = jax.random.PRNGKey(seed)
    codes0 = jnp.zeros((1, lm_cfg.n_codebooks, 16), jnp.int32)
    init_kwargs = {}
    if controller is not None:
        init_kwargs = dict(
            ctrls={k: jnp.zeros((1, 16, d)) for k, d in controller.ctrl_dims.items()},
            ctrl_masks={k: jnp.ones((1, 16), jnp.int32) for k in controller.ctrl_dims},
        )
    if fine_tune and args.get("init_ckpt"):
        from ..checkpoints import load_lm

        base_cfg, lm_params = load_lm(args["init_ckpt"])
        if base_cfg.lora_r != lm_cfg.lora_r:
            # graft fresh adapters onto the base weights
            init = lm.init(key, codes0, codebooks, method="forward_codes", **init_kwargs)["params"]
            import flax.traverse_util as tu

            flat = tu.flatten_dict(init)
            base = tu.flatten_dict(lm_params)
            for k in flat:
                if k in base:
                    flat[k] = base[k]
            lm_params = tu.unflatten_dict(flat)
    else:
        lm_params = lm.init(key, codes0, codebooks, method="forward_codes", **init_kwargs)["params"]

    # ----- optimizer -----
    lora_filter = lora_param_filter(lm_params) if fine_tune else None
    optimizer = make_optimizer(
        lm_cfg.embedding_dim,
        factor=float(args.get("NoamScheduler.factor", 2.0)),
        warmup=int(args.get("NoamScheduler.warmup", 10000)),
        grad_clip=grad_clip,
        lora_filter=lora_filter,
        state_dtype=args.get("AdamW.state_dtype"),
    )
    opt_state = optimizer.init(lm_params)

    # ----- mesh + shardings -----
    tp = int(args.get("mesh.tp", 1) or 1)
    n_proc_mesh = jax.process_count()
    dp_req = args.get("mesh.dp")
    if dp_req is None:
        # largest dp that divides the batch (unused devices are dropped —
        # single-host only, see below)
        dp_req = len(jax.devices()) // tp
        while dp_req > 1 and batch_size % dp_req != 0:
            dp_req -= 1
    dp_req = int(dp_req)
    if n_proc_mesh > 1 and dp_req * tp != len(jax.devices()):
        # dropping devices multi-host would leave hosts with unequal mesh
        # slices and break make_array_from_process_local_data's row layout
        raise ValueError(
            f"multi-host mesh must use every device: dp*tp = {dp_req}*{tp} "
            f"!= {len(jax.devices())} global devices (pick batch_size/"
            "mesh.dp/mesh.tp so they multiply out)"
        )
    mesh = make_mesh(n_devices=dp_req * tp, dp=dp_req, tp=tp)
    dp = mesh.shape["dp"]
    assert batch_size % dp == 0, f"batch_size {batch_size} not divisible by dp {dp}"
    param_specs = lm_param_specs(lm_params)
    moment_specs = zero1_specs(param_specs, lm_params, dp_size=dp)
    opt_specs = opt_state_specs(opt_state, moment_specs)
    sh = lambda tree: jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), tree)
    rep = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("dp", None, None))

    state = TrainState(
        params=jax.device_put(lm_params, sh(param_specs)),
        opt_state=jax.device_put(opt_state, sh(opt_specs)),
        step=jax.device_put(jnp.zeros((), jnp.int32), rep),
    )
    codec_params = jax.device_put(codec_params, rep)
    codebooks = jax.device_put(codebooks, rep)

    state_sh = TrainState(sh(param_specs), sh(opt_specs), rep)
    train_step = jax.jit(
        make_train_step(lm, codec, optimizer, label_smoothing=label_smoothing,
                        controller=controller,
                        # bound codec-encode temps (the big-batch OOM source;
                        # see make_train_step)
                        encode_microbatch=_encode_microbatch(args, dp)),
        in_shardings=(state_sh, rep, rep, batch_sharding, rep),
        out_shardings=(state_sh, rep),
        # donate the state: params + Adam moments (~4 GB fp32 at coarse
        # scale) would otherwise be live twice across the update
        donate_argnums=(0,),
    )

    # eval step: loss only, no update
    from .step import loss_and_metrics
    from ..util import codebook_flatten
    from .. import mask as pmask

    def eval_step(params, codec_params, codebooks, audio, key):
        k_r, k_mask, k_ctrl = jax.random.split(key, 3)
        codes = codec.apply({"params": codec_params}, audio, method="encode")["codes"]
        z = codes[:, : lm_cfg.n_codebooks, :]
        r = jax.random.uniform(k_r, (z.shape[0],))
        mask = pmask.codebook_unmask(
            pmask.random(k_mask, z, r), lm_cfg.n_conditioning_codebooks
        )
        z_masked, mask = pmask.apply_mask(z, mask, lm_cfg.mask_token)
        ctrls = ctrl_masks = None
        if controller is not None:
            ctrls = controller.extract(audio[..., 0])
            ctrls = {k: v[:, : z.shape[-1], :] for k, v in ctrls.items()}
            ctrl_masks = controller.random_mask(ctrls, r, k_ctrl)
            ctrl_masks = {k: v[:, : z.shape[-1]] for k, v in ctrl_masks.items()}
        logits = lm.apply(
            {"params": params}, z_masked, codebooks, ctrls, ctrl_masks,
            method="forward_codes",
        )
        ncc = lm_cfg.n_conditioning_codebooks
        _, metrics = loss_and_metrics(
            logits, z[:, ncc:, :], codebook_flatten(mask[:, ncc:, :]), r,
            label_smoothing=label_smoothing,
        )
        return metrics

    eval_step = jax.jit(eval_step)

    # ----- data -----
    train_data, val_data = build_datasets(args, codec_cfg.sample_rate)

    # ----- tracker / checkpoints / resume -----
    is_main = jax.process_index() == 0
    tracker = Tracker(
        log_dir=str(save_path / "tb"), log_file=str(save_path / "metrics.jsonl"),
        rank=0 if is_main else 1,
    )
    # `save_async: true` (explicit opt-in, documented in configs/vampnet.yml)
    # overlaps the orbax disk write with subsequent train steps — the state
    # is host-copied before save() returns, so the donated device buffers are
    # safe, and the previously committed tree is preserved as state.prev/
    # until the new write commits (CheckpointManager crash-safety contract).
    # Default is blocking saves: save() returns with the tag durable on disk.
    ckpt = CheckpointManager(
        save_path, is_main=is_main,
        async_save=bool(args.get("save_async", False)),
    )
    if resume and ckpt.has_tag(tag):
        tree, tracker_state = ckpt.restore(tag, state)
        state = TrainState(tree["params"], tree["opt_state"], tree["step"])
        if tracker_state:
            tracker.load_state_dict(tracker_state)
        print(f"resumed from {save_path}/{tag} at step {int(state.step)}", flush=True)

    cfglib.dump_args(args, save_path / "args.yml")
    start_step = int(state.step)
    # step keys feed a jit input declared REPLICATED — they must be
    # value-identical on every process (GSPMD replication invariant); only
    # the data stream is per-process (reference counterpart: identical DDP
    # seeds for the model, DistributedSampler for the data, train.py:655,678)
    step_rng = np.random.default_rng(seed)
    # validation must also be host-identical: `tracker.is_best` gates the
    # collective "best" checkpoint save, so hosts that computed different
    # val losses would diverge into (or out of) the collective and deadlock
    val_rng = np.random.default_rng(seed + 1)

    n_proc, pid = jax.process_count(), jax.process_index()
    if batch_size % n_proc != 0:
        raise ValueError(f"batch_size {batch_size} not divisible by {n_proc} hosts")
    loader = BatchLoader(
        train_data, batch_size, num_workers=num_workers,
        start_idx=start_step * batch_size, shard=(pid, n_proc),
    )
    it = iter(loader)

    def to_global(batch: np.ndarray):
        """Assemble this host's (batch_size/n_proc) rows into the globally
        dp-sharded batch. Single-host: a plain device_put."""
        if n_proc == 1:
            return jax.device_put(jnp.asarray(batch), batch_sharding)
        return jax.make_array_from_process_local_data(batch_sharding, batch)

    t_last = time.time()
    for step_i in range(start_step, num_iters):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(
                BatchLoader(
                    train_data, batch_size, num_workers=num_workers,
                    shard=(pid, n_proc),
                )
            )
            batch = next(it)
        audio = to_global(batch)
        # rbg = the TPU hardware RNG: measured 18.6% faster train step than
        # threefry (209 vs 257 ms at coarse scale, scratch/bench_train.py) —
        # the in-step dropout masks are ~700M PRNG words on the VPU. Still
        # deterministic per key; stream differs from threefry (training only,
        # the sampler keeps threefry semantics). Opt out with prng: threefry.
        step_key = jax.random.key(
            int(step_rng.integers(0, 2**31 - 1)), impl=prng_impl
        )
        state, metrics = train_step(state, codec_params, codebooks, audio, step_key)
        tracker.step = step_i + 1
        tracker.log("train", {k: v for k, v in metrics.items()})

        if (step_i + 1) % 50 == 0:
            dt = time.time() - t_last
            t_last = time.time()
            tracker.print_status("train", extra=f"{50/dt:.2f} it/s")

        if sample_freq and (step_i + 1) % sample_freq == 0:
            # EVERY process runs the sample-generation compute (the params
            # are sharded over the global mesh, so the SPMD programs need
            # all hosts); only rank 0 writes the files/TB entries
            save_samples(
                lm, lm_cfg, state.params, codec, codec_params, codebooks,
                audio, save_path, tracker, step_i + 1,
                controller=controller, is_main=is_main,
            )

        if val_freq and (step_i + 1) % val_freq == 0:
            val_metrics = validate(
                eval_step, state.params, codec_params, codebooks, val_data,
                batch_size, val_rng, shard=(pid, n_proc), to_global=to_global,
            )
            tracker.log("val", val_metrics)
            tracker.print_status("val")
            ckpt.save("latest", state, lm_cfg, tracker.state_dict(), fine_tune)
            if tracker.is_best("val", "loss"):
                ckpt.save("best", state, lm_cfg, tracker.state_dict(), fine_tune)
            if (step_i + 1) in save_iters:
                ckpt.save(
                    f"{(step_i + 1) // 1000}k", state, lm_cfg,
                    tracker.state_dict(), fine_tune,
                )

    ckpt.save("latest", state, lm_cfg, tracker.state_dict(), fine_tune)
    ckpt.wait_until_finished()
    tracker.close()
    return state


def save_samples(
    lm, lm_cfg, params, codec, codec_params, codebooks, audio, save_path,
    tracker, step, n_save=4, controller=None, is_main=True,
):
    """Audio demos every sample_freq steps (reference train.py:439-534):
    reconstruction, inpainted prompt (mask -> silence), and generate-filled
    inpainting, written as wavs + logged to TensorBoard when available.

    Multi-host: called by EVERY process (params live on the global mesh, so
    each compute below is an SPMD program all hosts must join); file/TB
    writes are rank-0-only via `is_main`."""
    from ..audio import AudioSignal
    from ..sampling.generate import generate as _generate

    audio = jnp.asarray(audio[:n_save])
    codes = codec.apply({"params": codec_params}, audio, method="encode")["codes"]
    z = codes[:, : lm_cfg.n_codebooks, :]
    mask_token = lm_cfg.mask_token

    n_prefix = int(z.shape[-1] * 0.25)
    n_suffix = int(z.shape[-1] * 0.25)
    mask = pmask.inpaint(z, n_prefix, n_suffix)
    mask = pmask.codebook_unmask(mask, lm_cfg.n_conditioning_codebooks)
    z_masked, mask = pmask.apply_mask(z, mask, mask_token)

    ctrls = ctrl_masks = None
    if controller is not None:
        ctrls = controller.extract(audio[..., 0])
        ctrls = {k: v[:, : z.shape[-1], :] for k, v in ctrls.items()}
        ctrl_masks = controller.empty_mask(ctrls)
        ctrl_masks = {k: v[:, : z.shape[-1]] for k, v in ctrl_masks.items()}

    def fwd(zm, c=None, cm=None):
        return lm.apply(
            {"params": params}, zm, codebooks, ctrls, ctrl_masks,
            method="forward_codes",
        )

    imputed = _generate(
        fwd, jax.random.PRNGKey(step), z_masked, mask, mask_token,
        n_conditioning_codebooks=lm_cfg.n_conditioning_codebooks,
        sampling_steps=12,
    )

    def decode(codes_in):
        z0 = jnp.where(codes_in == mask_token, 0, codes_in)
        wav = codec.apply({"params": codec_params}, z0, method="decode_codes")
        # silence fully-masked frames (reference transformer.py:677-682)
        all_masked = jnp.all(codes_in == mask_token, axis=1)
        hop = codec.config.hop_length
        t = all_masked.shape[1]
        wav = wav[:, : t * hop].reshape(wav.shape[0], t, hop)
        return (wav * (~all_masked)[:, :, None]).reshape(wav.shape[0], t * hop)

    outs = {
        "reconstructed": decode(z),
        "inpainted_prompt": decode(z_masked),
        "inpainted_middle": decode(imputed),
    }
    multi = jax.process_count() > 1
    if multi:
        # fetch the globally-sharded outputs to host numpy on every process
        # (a collective — all hosts reach it together), THEN gate the writes
        from jax.experimental import multihost_utils

        outs = {
            k: multihost_utils.process_allgather(v, tiled=True)
            for k, v in outs.items()
        }
    if not is_main:
        return
    sample_dir = Path(save_path) / "samples" / f"step_{step}"
    for name, wavs in outs.items():
        wavs = np.asarray(wavs)
        for i in range(wavs.shape[0]):
            out = sample_dir / name
            out.mkdir(parents=True, exist_ok=True)
            AudioSignal(wavs[i][None, None, :], codec.config.sample_rate).write(
                out / f"{i}.wav"
            )
            tracker.log_audio(f"{name}/{i}", wavs[i], codec.config.sample_rate, step)


def validate(
    eval_step, params, codec_params, codebooks, val_data, batch_size, rng,
    n_batches=4, shard=(0, 1), to_global=None,
):
    """Host-identical validation: the loader shards the SAME global batches
    across processes (BatchLoader yields slabs in global-index order) and
    the keys come from the host-identical val_rng, so every host computes
    the same val loss and `tracker.is_best` cannot diverge into/out of the
    collective 'best' save."""
    out = {}
    count = 0
    loader = BatchLoader(val_data, batch_size, num_workers=2, shard=shard)
    for i, batch in enumerate(loader):
        if i >= n_batches:
            break
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
        batch = to_global(batch) if to_global is not None else jnp.asarray(batch)
        m = eval_step(params, codec_params, codebooks, batch, key)
        for k, v in m.items():
            out[k] = out.get(k, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in out.items()}


def main(argv=None):
    args = cfglib.parse_args(argv)
    # multi-host launch: if a coordinator is configured in the environment
    # (JAX-native or torchrun-dialect vars), join the slice before any
    # device query — the reference counterpart is torchrun's implicit
    # process-group init (reference scripts/exp/train.py:743)
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MASTER_ADDR"):
        from ..parallel import multihost_init

        pid, n = multihost_init()
        print(f"[multihost] process {pid}/{n}, {len(jax.devices())} global devices")
    return train(args)


if __name__ == "__main__":
    main()
