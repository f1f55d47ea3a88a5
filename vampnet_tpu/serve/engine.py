"""Continuous-batching vamp engine (BASELINE.json config 5).

The reference serves one request at a time through gradio (app.py:129
_vamp_internal); concurrent users queue. Here, concurrent requests are merged
into shared device batches:

  * requests land in a queue; a scheduler thread drains whatever is pending
    (up to max_batch) and runs ONE batched two-stage generate for all of them;
  * per-request sampling knobs (temperature, mask_temperature, top_p,
    sample_cutoff, seed) are **per-row traced arrays** inside the jitted
    sampler, so heterogeneous requests share a compilation;
  * shapes are bucketed (token length padded to the coarse chunk grid) so the
    compile cache stays small;
  * static sampling config (steps, typical flags) keys the bucket — requests
    with different static configs run in separate batches;
  * batches are **pipelined**: a dispatcher thread forms and dispatches device
    programs (JAX async dispatch returns before execution), and a collector
    thread syncs results back. While batch A's output is in flight through
    the device tunnel (~150 ms RPC), batch B is already running — the device
    never idles between batches. `pipeline_depth` bounds in-flight batches.

The engine wraps an `Interface` and reuses its jit caches.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
import traceback
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VampRequest:
    codes: np.ndarray  # (1, n_codebooks, t)
    mask: np.ndarray  # (1, n_codebooks, t)
    seed: int = 0
    temperature: float = 1.0
    mask_temperature: float = 10.5
    top_p: Optional[float] = None
    sample_cutoff: float = 1.0
    sampling_steps: int = 12
    typical_filtering: bool = True
    typical_mass: float = 0.15
    typical_min_tokens: int = 64
    coarse_only: bool = False


class VampEngine:
    def __init__(
        self,
        interface,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        bucket_tokens: Optional[int] = None,
        data_parallel: bool = False,
        pipeline_depth: int = 2,
    ):
        """With `data_parallel=True` (requires a prior `interface.shard()`),
        request batches are sharded over the mesh's dp axis — concurrent
        requests spread across chips while params stay replicated."""
        self.interface = interface
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.bucket_tokens = bucket_tokens or interface.s2t(
            interface.coarse.chunk_size_s
        )
        self.data_parallel = data_parallel
        self._mesh = getattr(interface, "_mesh", None)
        if data_parallel:
            assert self._mesh is not None, (
                "data_parallel serving requires interface.shard(mesh) first"
            )
            self.dp = self._mesh.shape.get("dp", 1)
        else:
            self.dp = 1
        self._q: "queue.Queue[Tuple[VampRequest, Future]]" = queue.Queue()
        # dispatched-but-unsynced batches; bounded put() is the backpressure
        # that caps device memory at pipeline_depth concurrent batches
        self._inflight: "queue.Queue[Tuple[Any, List, List[int]]]" = queue.Queue(
            maxsize=max(1, pipeline_depth)
        )
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._collector = threading.Thread(target=self._collect_loop, daemon=True)
        self._thread.start()
        self._collector.start()
        self.stats = {"batches": 0, "requests": 0, "batched_requests": 0}

    # ---------------- public API ----------------

    def warmup(self, batch_sizes=(1, 2, 4, 8), seconds=None, sampling_steps=12):
        """Precompile the common (batch, bucket) programs at server startup so
        first user requests don't pay the compile (minutes on remote-compiled
        backends). Runs real tiny-masked requests through the normal path."""
        iface = self.interface
        t = self.bucket_tokens if seconds is None else iface.s2t(seconds)
        n_cb = (
            iface.c2f.n_codebooks if iface.c2f is not None else iface.coarse.n_codebooks
        )
        codes = np.zeros((1, n_cb, t), dtype=np.int32)
        mask = np.ones((1, n_cb, t), dtype=np.int32)
        futs = []
        for bs in sorted(set(batch_sizes)):
            futs.extend(
                self.submit(
                    VampRequest(codes=codes, mask=mask, seed=i,
                                sampling_steps=sampling_steps)
                )
                for i in range(bs)
            )
            for f in futs:
                f.result()
            futs.clear()
        return self

    def submit(self, req: VampRequest) -> Future:
        fut: Future = Future()
        self._q.put((req, fut))
        return fut

    def vamp(self, req: VampRequest, timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(req).result(timeout)

    def close(self):
        # order matters: stop the dispatcher FIRST and join it, so nothing
        # can enter _inflight after the collector's shutdown sentinel —
        # otherwise a batch dispatched during close() would hang its futures
        self._stop.set()
        self._thread.join(timeout=30)
        try:  # sentinel: drain then exit (timeout in case the collector is
            # wedged on a hung device call — the daemon thread dies with us)
            self._inflight.put(None, timeout=30)
        except queue.Full:  # pragma: no cover - wedged collector
            pass
        self._collector.join(timeout=30)
        # defensive: fail any futures a wedged collector left behind
        while True:
            try:
                item = self._inflight.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            for _req, fut in item[1]:
                if not fut.done():
                    fut.set_exception(RuntimeError("engine closed"))

    # ---------------- scheduler ----------------

    def _static_key(self, req: VampRequest, t_bucket: int):
        return (
            t_bucket,
            req.sampling_steps,
            req.typical_filtering,
            round(req.typical_mass, 6),
            req.typical_min_tokens,
            req.top_p is not None,
            req.coarse_only,
        )

    def _bucket_len(self, t: int) -> int:
        # sp mode: bucket on the interface's sp padding grid, not the coarse
        # chunk grid — the chunk-free generate runs at sp_pad_len(t), and
        # pre-padding past it would CHANGE the program's sequence length
        # (padded mask-token rows attend and count in the MaskGIT schedule),
        # so engine tokens would diverge from a solo coarse_vamp call.
        if getattr(self.interface, "_sp_mesh", None) is not None:
            return self.interface.sp_pad_len(t)
        b = self.bucket_tokens
        return ((t + b - 1) // b) * b

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch: List[Tuple[VampRequest, Future]] = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1000.0
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            # group by static config bucket
            groups: Dict[Any, List[Tuple[VampRequest, Future]]] = {}
            for req, fut in batch:
                t = req.codes.shape[-1]
                groups.setdefault(self._static_key(req, self._bucket_len(t)), []).append(
                    (req, fut)
                )
            # update stats BEFORE resolving futures: callers read stats as
            # soon as their result lands
            self.stats["batches"] += len(groups)
            self.stats["requests"] += len(batch)
            self.stats["batched_requests"] += sum(
                len(v) for v in groups.values() if len(v) > 1
            )
            for key, items in groups.items():
                try:
                    out, lens = self._dispatch_group(key, items)
                except Exception as e:  # pragma: no cover - defensive
                    tb = traceback.format_exc()
                    for _req, fut in items:
                        if not fut.done():
                            fut.set_exception(RuntimeError(f"{e}\n{tb}"))
                    continue
                # blocks when pipeline_depth batches are already in flight;
                # poll _stop while waiting so a close() with a wedged
                # collector can't strand this batch in the queue AFTER the
                # drain loop ran (its futures would never resolve)
                while True:
                    try:
                        self._inflight.put((out, items, lens), timeout=0.5)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            for _req, fut in items:
                                if not fut.done():
                                    fut.set_exception(
                                        RuntimeError("engine closed during dispatch")
                                    )
                            break

    def _collect_loop(self):
        """Sync dispatched batches back to the host and resolve futures.

        Runs concurrently with the dispatcher: np.asarray here waits on the
        device + transfer while the dispatcher is already building and
        dispatching the next batch."""
        while True:
            item = self._inflight.get()  # None = shutdown sentinel (close())
            if item is None:
                return
            out, items, lens = item
            try:
                out_np = np.asarray(out)
            except Exception as e:  # pragma: no cover - device-side failure
                tb = traceback.format_exc()
                for _req, fut in items:
                    if not fut.done():
                        fut.set_exception(RuntimeError(f"{e}\n{tb}"))
                continue
            for i, (_req, fut) in enumerate(items):
                if not fut.done():
                    fut.set_result(out_np[i : i + 1, :, : lens[i]])

    def _dispatch_group(self, key, items: List[Tuple[VampRequest, Future]]):
        iface = self.interface
        t_bucket = key[0]
        reqs = [r for r, _ in items]
        n = len(reqs)
        n_cb = reqs[0].codes.shape[1]

        # dp serving: round the device batch up to a dp multiple (padding rows
        # repeat the last request; their outputs are dropped)
        n_dev = ((n + self.dp - 1) // self.dp) * self.dp if self.dp > 1 else n
        codes = np.zeros((n_dev, n_cb, t_bucket), dtype=np.int32)
        mask = np.ones((n_dev, n_cb, t_bucket), dtype=np.int32)
        lens = []
        for i in range(n_dev):
            r = reqs[min(i, n - 1)]
            t = r.codes.shape[-1]
            if i < n:
                lens.append(t)
            codes[i, :, :t] = r.codes[0]
            mask[i, :, :t] = r.mask[0]
        pad_rows = n_dev - n
        if pad_rows:
            reqs = reqs + [reqs[-1]] * pad_rows

        temp = np.array([r.temperature for r in reqs], np.float32)
        mtemp = np.array([r.mask_temperature for r in reqs], np.float32)
        top_p = np.array(
            [r.top_p if r.top_p is not None else 1.0 for r in reqs], np.float32
        )
        cutoff = np.array([r.sample_cutoff for r in reqs], np.float32)
        # per-ROW seeds: generate() vmaps every random draw over row keys, so
        # a request's tokens depend only on its own seed — identical solo or
        # batched, and stable across server restarts (no Python hash()).
        seeds = np.array([r.seed for r in reqs], dtype=np.uint32)
        # decorrelate the c2f stage from coarse with a fixed odd-constant
        # offset (golden-ratio increment), keeping per-request determinism
        seeds_c2f = (seeds + np.uint32(0x9E3779B9)).astype(np.uint32)

        codes_d, mask_d = jnp.asarray(codes), jnp.asarray(mask)
        if self.dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self._mesh, P("dp", None, None))
            codes_d = jax.device_put(codes_d, sh)
            mask_d = jax.device_put(mask_d, sh)

        r0 = reqs[0]
        out = iface.coarse_vamp(
            codes_d,
            mask_d,
            seed=seeds,
            _sampling_steps=r0.sampling_steps,
            temperature=jnp.asarray(temp),
            mask_temperature=jnp.asarray(mtemp),
            typical_filtering=r0.typical_filtering,
            typical_mass=r0.typical_mass,
            typical_min_tokens=r0.typical_min_tokens,
            top_p=jnp.asarray(top_p) if key[5] else None,
            sample_cutoff=jnp.asarray(cutoff),
        )
        if not r0.coarse_only and iface.c2f is not None:
            # forward the full per-request knob set (round-1 review: only
            # temperature reached the fine stage; the rest silently reset)
            out = iface.coarse_to_fine(
                out, mask=jnp.asarray(mask), seed=seeds_c2f,
                temperature=jnp.asarray(temp),
                mask_temperature=jnp.asarray(mtemp),
                typical_filtering=r0.typical_filtering,
                typical_mass=r0.typical_mass,
                typical_min_tokens=r0.typical_min_tokens,
                top_p=jnp.asarray(top_p) if key[5] else None,
                sample_cutoff=jnp.asarray(cutoff),
            )
        # no sync here: JAX async dispatch has queued the device programs;
        # the collector thread does the (slow, tunnel-bound) host transfer
        return out, lens
