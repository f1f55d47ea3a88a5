"""bench.py emission contract (round-4, VERDICT item 1).

BENCH_r03 timed out (rc=124) and captured nothing because the old bench
printed its single JSON line only at the very end. The restructured bench
prints the headline immediately and re-prints a SUPERSET line after each
optional stage, so a driver that parses either the first or the last JSON
line on stdout always gets a valid result — even if it kills the process
mid-stage. These tests pin that contract by running the real script in a
subprocess (smoke scale, CPU) and checking every line.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_bench(budget, timeout_s: int = 600, force_cold: bool = False):
    env = dict(os.environ)
    env.update(
        VAMPNET_BENCH_SMOKE="1",
        # isolate from the real persistent cache
        VAMPNET_JAX_CACHE="/tmp/vampnet_bench_test_cache",
    )
    if budget is not None:
        env["VAMPNET_BENCH_BUDGET_S"] = budget
    else:
        env.pop("VAMPNET_BENCH_BUDGET_S", None)  # exercise the shipped default
    if force_cold:
        env["VAMPNET_BENCH_FORCE_COLD"] = "1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=timeout_s, env=env, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    return [json.loads(l) for l in lines], proc


@pytest.fixture(scope="module")
def zero_budget_run():
    return _run_bench(budget="0")


def test_bench_zero_budget_emits_headline_and_skip_record(zero_budget_run):
    """With no budget for optional stages, the headline must still be a
    complete, valid result, and the final line must record what was skipped."""
    results, _ = zero_budget_run
    assert len(results) >= 2  # headline + final skip-record line

    first, last = results[0], results[-1]
    for r in results:
        assert r["metric"] == "audio_sec_generated_per_wall_sec_per_chip"
        assert r["unit"] == "audio_s/s/chip"
        assert r["value"] > 0
        assert r["detail"]["p50_vamp_latency_s"] > 0
        assert r["detail"]["backend"] == "cpu"
        assert r["detail"]["smoke"] is True

    # headline fields never change across re-emissions
    assert first["value"] == last["value"]
    assert first["vs_baseline"] == last["vs_baseline"]

    # every optional stage the CPU backend reaches was gated off and recorded
    skipped = {s["stage"] for s in last["detail"]["skipped"]}
    assert skipped == {
        "device_split", "device_split_fallback", "serving", "hot_swap",
        "long_form",
    }

    # superset property: each successive line carries at least the keys of
    # the one before (a last-line parser never loses information)
    for a, b in zip(results, results[1:]):
        assert set(a["detail"]) <= set(b["detail"])


def test_bench_lines_are_parseable_json_only_on_stdout(zero_budget_run):
    """stdout carries ONLY json lines (progress goes to stderr), so any
    'parse the last/first line' driver convention works."""
    results, proc = zero_budget_run
    for line in proc.stdout.splitlines():
        if line.strip():
            json.loads(line)  # raises if any stray non-JSON stdout line
    assert "[bench" in proc.stderr  # progress log went to stderr


def test_bench_default_budget_survives_cold_estimates():
    """Regression for BENCH_r04: the old 900 s default was mathematically
    unable to run ANY optional stage on a cold start (observed cold e2e
    warmup ~1,070 s), so the driver artifact carried a headline and nothing
    else. With VAMPNET_BENCH_FORCE_COLD the gates use cold estimates; under
    the SHIPPED default budget the high-value stages (serving first among
    them) must still run."""
    results, _ = _run_bench(budget=None, force_cold=True)
    last = results[-1]
    skipped = {s["stage"] for s in last["detail"]["skipped"]}
    assert "serving" not in skipped, last["detail"]["skipped"]
    assert "serving_audio_s_per_s_per_chip" in last["detail"]
    assert "hot_swap_reload_s" in last["detail"]
    assert "long_form_p50_s" in last["detail"]


def test_bench_only_ds_mode_runs_device_split_and_nothing_else():
    """VAMPNET_BENCH_ONLY_DS=1 is the cache-warming mode for the chained
    differential (the remote-compile service's biggest program): every other
    optional stage must be skipped with an only_ds record, and device_split
    must still run and emit its fields."""
    env = dict(os.environ)
    env.update(
        VAMPNET_BENCH_SMOKE="1",
        VAMPNET_BENCH_ONLY_DS="1",
        VAMPNET_JAX_CACHE="/tmp/vampnet_bench_test_cache",
    )
    env.pop("VAMPNET_BENCH_BUDGET_S", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    last = json.loads(lines[-1])
    only_ds_skips = {
        s["stage"] for s in last["detail"]["skipped"]
        if s.get("reason") == "only_ds"
    }
    assert only_ds_skips == {"serving", "hot_swap", "long_form"}
    assert "device_program_s" in last["detail"]
    assert "serving_audio_s_per_s_per_chip" not in last["detail"]


def test_seed_cache_links_missing_entries(tmp_path, monkeypatch):
    """bench._seed_cache must populate the runtime cache from the committed
    seed without clobbering entries already present (a driver clone starts
    warm; a developer's live cache is never overwritten)."""
    sys.path.insert(0, str(REPO))
    import bench

    seed = tmp_path / ".jax_cache_seed"
    seed.mkdir()
    (seed / "a-cache").write_bytes(b"seed-a")
    (seed / "b-cache").write_bytes(b"seed-b")
    cache = tmp_path / ".jax_cache"
    cache.mkdir()
    (cache / "b-cache").write_bytes(b"live-b")  # pre-existing entry

    bench._seed_cache(str(cache), seed=str(seed))
    assert (cache / "a-cache").read_bytes() == b"seed-a"
    assert (cache / "b-cache").read_bytes() == b"live-b"  # not clobbered


def test_refresh_cache_collects_only_read_entries(tmp_path, monkeypatch):
    """scripts/refresh_bench_cache.py's mark->read->collect cycle must pick
    exactly the entries the bench READ (fresh atime) and atomically replace
    the previous seed."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "refresh_bench_cache", REPO / "scripts" / "refresh_bench_cache.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cache = tmp_path / ".jax_cache"
    cache.mkdir()
    (cache / "used-cache").write_bytes(b"u" * 64)
    (cache / "stale-cache").write_bytes(b"s" * 64)
    monkeypatch.setattr(mod, "CACHE", str(cache))
    monkeypatch.setattr(mod, "SEED", str(tmp_path / ".jax_cache_seed"))

    assert mod.mark() == 2
    # simulate the bench reading one entry (atime -> now; relatime updates
    # because the marked atime is older than mtime)
    os.utime(cache / "used-cache", None)

    mod.collect()
    seed = tmp_path / ".jax_cache_seed"
    assert sorted(p.name for p in seed.iterdir()) == ["used-cache"]

    # second refresh replaces the seed and keeps the previous one
    mod.mark()
    os.utime(cache / "stale-cache", None)
    mod.collect()
    assert sorted(p.name for p in seed.iterdir()) == ["stale-cache"]
    assert (tmp_path / ".jax_cache_seed.prev" / "used-cache").exists()
