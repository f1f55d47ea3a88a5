"""Guard for the committed compile-cache seed (VERDICT r4 item 1).

Round 4's flagship fix failed silently: the commit that claimed to add
`.jax_cache_seed/` contained only the seeding machinery, the driver's fresh
clone compiled cold for ~1,070 s, and the bench budget-skipped five of six
stages. These tests fail in exactly the states that caused that: the seed
directory bench.py loads from is absent, empty, suspiciously small, or its
entries are not actually tracked by git (present on the builder's disk but
missing from every clone).

Refresh flow: scripts/refresh_bench_cache.py (run on the real TPU after any
change that re-keys a jitted program on the bench path), then
`git add .jax_cache_seed`.
"""
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(REPO, ".jax_cache_seed")


def test_seed_dir_present_and_nonempty():
    assert os.path.isdir(SEED), (
        f"{SEED} is missing — the driver bench will run COLD and skip every "
        "optional stage. Run scripts/refresh_bench_cache.py on the TPU and "
        "commit the result."
    )
    entries = [n for n in os.listdir(SEED) if not n.startswith(".")]
    assert entries, f"{SEED} exists but is empty"
    total = sum(os.path.getsize(os.path.join(SEED, n)) for n in entries)
    # real compiled vamp_e2e/serving programs are tens of MB; anything under
    # 1 MB cannot possibly hold the bench working set
    assert total > 1 << 20, (
        f"seed holds only {total} bytes across {len(entries)} entries — "
        "not a plausible bench working set"
    )


def test_seed_entries_are_git_tracked():
    """The r4 failure specifically: seed on disk, never `git add`ed."""
    if not os.path.isdir(os.path.join(REPO, ".git")):
        pytest.skip("not a git checkout")
    try:
        tracked = subprocess.run(
            ["git", "ls-files", ".jax_cache_seed"],
            cwd=REPO, capture_output=True, text=True, timeout=60,
        ).stdout.splitlines()
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("git unavailable")
    assert tracked, (
        ".jax_cache_seed/ has no git-tracked files — a fresh driver clone "
        "will not receive the seed (this is exactly what broke BENCH_r04)"
    )
    on_disk = {n for n in os.listdir(SEED) if not n.startswith(".")}
    tracked_names = {os.path.basename(p) for p in tracked}
    missing = on_disk - tracked_names
    assert not missing, (
        f"{len(missing)} seed entries on disk are untracked (stage them or "
        f"refresh deliberately): {sorted(missing)[:3]} ..."
    )
