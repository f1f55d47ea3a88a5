"""Profiling utilities tests."""
import time

from vampnet_tpu import profiling


def test_timer_tick_tock(capsys):
    t = profiling.Timer()
    t.tick("x")
    time.sleep(0.01)
    assert t.tock("x") >= 0.01


def test_timing_and_summary():
    profiling.reset()

    @profiling.timer("stage_a")
    def work():
        time.sleep(0.005)

    for _ in range(3):
        work()
    with profiling.timing("stage_b"):
        time.sleep(0.002)
    s = profiling.summary()
    assert s["stage_a"]["count"] == 3
    assert s["stage_a"]["p50_s"] >= 0.004
    assert "stage_b" in s
    profiling.reset()
    assert profiling.summary() == {}
