"""Training checkpoint manager on orbax (reference train.py:382-419 checkpoint
tags + scripts' runs/<name>/<tag> layout; SURVEY.md §5.4).

Layout:
  runs/<name>/<tag>/state/      — orbax tree: params, opt_state, step
  runs/<name>/<tag>/tracker.json
  runs/<name>/<tag>/model.vtpu  — inference-ready LM checkpoint
  runs/<name>/<tag>/lora.vtpu   — adapter-only tree (fine-tune runs,
                                  reference train.py:399-406)
Tags: latest (every save), best (val-loss, reference :395-397), <N>k at
save_iters (:392-394).

Multi-host: the orbax save/restore of the (possibly cross-process-sharded)
train state is a COLLECTIVE — every process participates, with `save_path`
on shared storage; only the host-side extras (tracker.json, model.vtpu,
lora.vtpu) are rank-0-gated (reference counterpart: ZeRO consolidation to
rank 0 + rank-0 writes, train.py:376-385).

Crash safety: a tag's last committed state tree is NEVER destroyed before
its replacement commits. save() renames `state/` -> `state.prev/` (with a
paired `tracker.json.prev` snapshot) instead of deleting it; the prev copy
is removed only after orbax finalizes the new write (its atomic
tmp-dir -> `state/` rename). A crash in the async-write window therefore
leaves `state.prev/` restorable — has_tag()/restore() fall back to it —
instead of silently restarting training from scratch.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..checkpoints import save_lm, save_lora
from ..modules.lora import lora_state_dict


class CheckpointManager:
    def __init__(
        self, save_path: str, is_main: bool = True, async_save: bool = False
    ):
        self.root = Path(save_path).absolute()
        self.is_main = is_main
        # orbax's StandardCheckpointer IS an AsyncCheckpointer: save()
        # returns once the state is copied to host memory (so donated device
        # buffers are immediately reusable) and the disk write drains on a
        # background thread. async_save=True defers wait_until_finished() to
        # the next save()/explicit wait, overlapping the write with training.
        self.async_save = async_save
        self._ckptr = ocp.StandardCheckpointer()
        # tags whose old `state.prev/` awaits deletion once the new
        # `state/` commits (async writes commit on a background thread)
        self._pending_prev: list[Path] = []

    def _reap_committed_prev(self):
        """Delete preserved state.prev/ dirs whose replacement committed.
        Call only AFTER wait_until_finished() — orbax's atomic tmp->final
        rename is what makes `state/` existing mean 'committed'."""
        if not self.is_main:
            self._pending_prev.clear()
            return
        remaining = []
        for prev in self._pending_prev:
            if (prev.parent / "state").exists():
                shutil.rmtree(prev, ignore_errors=True)
                tprev = prev.parent / "tracker.json.prev"
                if tprev.exists():
                    tprev.unlink()
            else:
                remaining.append(prev)
        self._pending_prev = remaining

    def save(
        self,
        tag: str,
        state,
        lm_config,
        tracker_state: Optional[dict] = None,
        fine_tune: bool = False,
    ):
        # settle any in-flight async write BEFORE touching directories: a
        # previous save of this same tag may still be streaming into
        # state_dir's tmp path, and orbax serializes saves on one thread
        self._ckptr.wait_until_finished()
        self._reap_committed_prev()
        tag_dir = self.root / tag
        state_dir = tag_dir / "state"
        prev_dir = tag_dir / "state.prev"
        if self.is_main:
            tag_dir.mkdir(parents=True, exist_ok=True)
            if state_dir.exists():
                # preserve the committed tree until the new write commits: a
                # crash mid-(async)-write must not destroy the only copy
                if prev_dir.exists():
                    shutil.rmtree(prev_dir)
                state_dir.rename(prev_dir)
                tpath = tag_dir / "tracker.json"
                if tpath.exists():
                    shutil.copyfile(tpath, tag_dir / "tracker.json.prev")
                self._pending_prev.append(prev_dir)
            elif prev_dir.exists():
                # crash leftover from a previous process: keep it as the
                # fallback until THIS save commits, then reap it
                self._pending_prev.append(prev_dir)
        if jax.process_count() > 1:
            # ZeRO-1 shards the Adam moments over the global dp axis, so the
            # orbax save below is a collective: barrier so no process starts
            # writing while rank 0 is still clearing the old tag dir
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_processes(f"ckpt-save-{tag}")
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if jax.process_count() == 1:
            # prefetch the tree to host in ONE overlapped D2H wave: orbax's
            # own per-array transfer sequences round-trips on a remote-device
            # link (a 635 MB params tree did not finish in 9 min through the
            # axon tunnel; the overlapped wave moves it in ~18 s —
            # vampnet_tpu.checkpoints._to_host, scratch/probe_fetch.py).
            # Multi-process saves keep device arrays: the orbax write is a
            # collective over cross-process-sharded state, and each process
            # must hand orbax its own addressable shards.
            from ..checkpoints import _to_host

            tree = _to_host(tree)
        self._ckptr.save(state_dir, tree)
        if not self.async_save:
            self._ckptr.wait_until_finished()
            self._reap_committed_prev()
        if not self.is_main:
            return
        # host-side extras are written now (they host-pull params anyway),
        # so only the orbax tree write rides the background thread
        if tracker_state is not None:
            (tag_dir / "tracker.json").write_text(json.dumps(tracker_state))
        # reuse the already-fetched host params instead of a second D2H wave
        save_lm(tag_dir / "model.vtpu", lm_config, tree["params"])
        if fine_tune:
            save_lora(tag_dir / "lora.vtpu", lora_state_dict(tree["params"]))

    def wait_until_finished(self):
        """Block until any in-flight async save has committed to disk."""
        self._ckptr.wait_until_finished()
        self._reap_committed_prev()

    def restore(self, tag: str, abstract_state) -> tuple:
        """Returns (state_tree, tracker_state|None). `abstract_state` carries
        shapes/dtypes/shardings for sharded restore. Falls back to the
        preserved `state.prev/` (+ its paired tracker snapshot) when a crash
        interrupted the previous save before its commit."""
        self._ckptr.wait_until_finished()
        self._reap_committed_prev()
        tag_dir = self.root / tag
        abstract = {
            "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state.params),
            "opt_state": jax.tree.map(
                ocp.utils.to_shape_dtype_struct, abstract_state.opt_state
            ),
            "step": ocp.utils.to_shape_dtype_struct(abstract_state.step),
        }
        state_dir = tag_dir / "state"
        tpath = tag_dir / "tracker.json"
        if not state_dir.exists() and (tag_dir / "state.prev").exists():
            state_dir = tag_dir / "state.prev"
            if (tag_dir / "tracker.json.prev").exists():
                tpath = tag_dir / "tracker.json.prev"
        tree = self._ckptr.restore(state_dir, abstract)
        tracker_state = None
        if tpath.exists():
            tracker_state = json.loads(tpath.read_text())
        return tree, tracker_state

    def has_tag(self, tag: str) -> bool:
        # an async save commits (tmp-dir rename) only at finalize: settle
        # first so a just-saved tag is visible
        self._ckptr.wait_until_finished()
        tag_dir = self.root / tag
        return (tag_dir / "state").exists() or (tag_dir / "state.prev").exists()
