#!/usr/bin/env python
"""Rebuild `.jax_cache_seed/` — the committed compile-cache working set that
lets a driver bench run on a fresh clone start warm (bench.py:_seed_cache).

Every kernel/program change re-keys the affected compiled programs, so the
seed must be refreshed IN THE SAME COMMIT as any change that touches a
jitted program on the bench path (attention kernels, sampler, interface
dispatch, transfer dtype, ...). Flow (run on the real TPU, tunnel up):

    python scripts/refresh_bench_cache.py            # mark -> bench -> collect
    python scripts/refresh_bench_cache.py --no-run   # collect only (a warm
                                                     # bench ran just before)

Mechanism: the runtime cache dir (.jax_cache/) may hold hundreds of MB of
stale keys and scratch-bench programs; committing it whole is bloat. Instead
we set every entry's atime to the epoch, run the full bench (which READS
exactly its working set), and copy the freshly-read entries into
.jax_cache_seed/. Entries the bench never read stay stale-atime and are
excluded. The seed replaces the previous one atomically (old seed kept as
.jax_cache_seed.prev until the new one is in place).

atime semantics are PROBED at startup, not assumed: on a noatime mount the
first read after the rollback would NOT advance atime, warm entries the
bench read-but-didn't-recompile would be dropped, and the refreshed seed
would lose exactly the working set it exists to capture (advisor r4). The
probe writes a file, backdates its atime, reads it, and aborts with a clear
message if the read didn't advance atime.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
SEED = os.path.join(REPO, ".jax_cache_seed")
OLD = (2020, 1, 1)


def probe_atime():
    """Abort unless reading a backdated file advances its atime here."""
    p = os.path.join(CACHE, "._atime_probe")
    with open(p, "w") as f:
        f.write("probe")
    old = time.mktime((*OLD, 0, 0, 0, 0, 0, 0))
    st = os.stat(p)
    os.utime(p, (old, st.st_mtime))
    with open(p) as f:
        f.read()
    advanced = os.stat(p).st_atime > old + 1.0
    os.remove(p)
    if not advanced:
        sys.exit(
            "this filesystem does not update atime on read (noatime?) — the "
            "mark->read->collect cycle cannot identify the bench working set "
            "here. Remount with relatime, or collect on a filesystem that "
            "updates atime."
        )
    print("atime probe: reads advance atime (ok)")


def mark():
    t = time.mktime((*OLD, 0, 0, 0, 0, 0, 0))
    n = 0
    for name in os.listdir(CACHE):
        p = os.path.join(CACHE, name)
        st = os.stat(p)
        os.utime(p, (t, st.st_mtime))
        n += 1
    print(f"marked {n} entries (atime -> {OLD[0]})")
    return n


def collect():
    cutoff = time.mktime((OLD[0] + 1, 1, 1, 0, 0, 0, 0, 0, 0))
    fresh = [
        name
        for name in os.listdir(CACHE)
        if os.stat(os.path.join(CACHE, name)).st_atime > cutoff
    ]
    if not fresh:
        sys.exit("no freshly-read cache entries found — did the bench run?")
    tmp = SEED + ".new"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    total = 0
    sizes = []
    for name in fresh:
        src = os.path.join(CACHE, name)
        sz = os.path.getsize(src)
        total += sz
        sizes.append((sz, name))
        # copy, never hardlink: a shared inode would let future runtime
        # utime/rewrites of the cache entry mutate the committed seed
        shutil.copy2(src, os.path.join(tmp, name))
    prev = SEED + ".prev"
    shutil.rmtree(prev, ignore_errors=True)
    if os.path.isdir(SEED):
        os.rename(SEED, prev)
    os.rename(tmp, SEED)
    for sz, name in sorted(sizes, reverse=True):
        print(f"  {sz / 2**20:8.1f} MB  {name}")
    print(
        f"seed refreshed: {len(fresh)} entries, {total / 2**20:.0f} MB "
        f"-> {SEED} (previous kept at {prev})"
    )
    print("now: git add .jax_cache_seed && git ls-files .jax_cache_seed | head")


def main():
    if not os.path.isdir(CACHE):
        sys.exit(f"{CACHE} does not exist — run the bench once first")
    probe_atime()
    mark()
    if "--no-run" not in sys.argv:
        env = dict(os.environ)
        env.setdefault("VAMPNET_BENCH_BUDGET_S", "6000")
        print("running bench.py against the marked cache ...")
        rc = subprocess.call([sys.executable, os.path.join(REPO, "bench.py")], env=env)
        if rc != 0:
            sys.exit(f"bench.py exited {rc}; not collecting")
    collect()


if __name__ == "__main__":
    main()
