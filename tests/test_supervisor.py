"""Wedge watchdog: detection + automated recovery (SURVEY §5 "failure
detection / elastic recovery" — the reference has none).

Dummy child processes emulate the round-4 failure modes on CPU in
seconds: a wedge (log frozen + zero CPU), a SIGTERM handler that commits
sidecars then hangs like the d2h stall, a self-SIGSTOPped child (the
induced drill), a crash, and the log-silent-but-CPU-busy state (eval /
checkpoint staging) that must NOT trigger recovery.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from sagnn_tpu.train.supervisor import Supervisor, child_cpu_seconds

pytestmark = pytest.mark.filterwarnings("ignore")


CHILD = textwrap.dedent("""
    import os, signal, sys, time
    ckpt = sys.argv[1]
    mode = sys.argv[2]
    resumed = "--load_model" in sys.argv
    if resumed:
        print("Model Loaded, resuming at epoch 1", flush=True)
        sys.exit(0)
    if mode == "crash":
        print("Start", flush=True)
        sys.exit(3)
    def onterm(s, f):
        # like Trainer's preemption handler: finalize() commits the staged
        # sidecars host-side FIRST, then the preemption save hangs in d2h
        with open(os.path.join(ckpt, "history.json"), "w") as fh:
            fh.write("{}")
        print("signal: writing preemption checkpoint", flush=True)
        time.sleep(600)
    signal.signal(signal.SIGTERM, onterm)
    os.makedirs(os.path.join(ckpt, "state.tmp.orbax-checkpoint-tmp"),
                exist_ok=True)
    # first output AFTER the handler exists: the supervisor arms wedge
    # detection on first output, so with the 1s test window a wedge can
    # never SIGTERM this child while its disposition is still the default.
    # (The real Trainer logs Start/Load Data/Model Prepared before its
    # handler installs, but those phases log and burn CPU constantly and
    # the production window is 600s — the conjunction covers it.)
    print("Start", flush=True)
    if mode == "busy":
        t0 = time.time()
        x = 0.0
        while time.time() - t0 < 3.0:   # log-silent but CPU-active
            x += 1.0
        print("busy done", x, flush=True)
        sys.exit(0)
    if mode == "sigstop":
        os.kill(os.getpid(), signal.SIGSTOP)   # the induced drill
    time.sleep(600)                            # the wedge
""")


def make_sup(tmp_path, mode, **kw):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir(exist_ok=True)
    defaults = dict(
        argv=[sys.executable, str(script), str(ckpt), mode],
        log_path=str(tmp_path / "train.log"),
        ckpt_dir=str(ckpt),
        resume_args=["--load_model", "tem"],
        check_every=0.2, wedge_secs=1.0, cpu_eps=0.5,
        term_grace=15.0, commit_settle=0.3,
        max_recoveries=3, relay_probe=None)
    defaults.update(kw)
    return Supervisor(**defaults), ckpt


def test_wedge_detected_and_recovered(tmp_path):
    sup, ckpt = make_sup(tmp_path, "wedge")
    assert sup.run() == 0
    assert sup.recoveries == 1
    joined = "\n".join(sup.events)
    assert "WEDGE" in joined
    assert "SIGCONT+SIGTERM" in joined
    # the partial orbax staging dir was cleaned, the commit survived
    assert not (ckpt / "state.tmp.orbax-checkpoint-tmp").exists()
    assert (ckpt / "history.json").exists()
    log = (tmp_path / "train.log").read_text()
    assert "writing preemption checkpoint" in log   # handler ran pre-KILL
    assert "Model Loaded" in log                    # relaunch resumed


def test_sigstopped_child_recovers_via_sigcont(tmp_path):
    # SIGTERM alone cannot reach a SIGSTOPped process's handler; the
    # supervisor's SIGCONT+SIGTERM pair must
    sup, ckpt = make_sup(tmp_path, "sigstop")
    assert sup.run() == 0
    assert sup.recoveries == 1
    assert "writing preemption checkpoint" in \
        (tmp_path / "train.log").read_text()


def test_cpu_active_silence_is_not_a_wedge(tmp_path):
    # full-sort eval / multi-GB d2h staging are log-silent but CPU-busy;
    # the conjunction criterion must NOT kill them
    sup, _ = make_sup(tmp_path, "busy")
    assert sup.run() == 0
    assert sup.recoveries == 0
    assert "busy done" in (tmp_path / "train.log").read_text()


def test_silent_cap_trips_despite_cpu_activity(tmp_path):
    # A permanent wedge whose zombie threads trickle MORE than cpu_eps
    # per window resets the conjunction's quiet window forever (the 131k
    # run's stall measured ~2.4s/300s of relay-client retrying; a
    # permanent wedge with the same trickle would never be detected).
    # Once armed, silent_cap_secs of log silence alone must declare the
    # wedge regardless of CPU.
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent("""
        import sys, time
        if "--load_model" in sys.argv:
            print("Model Loaded, resuming at epoch 1", flush=True)
            sys.exit(0)
        print("Start", flush=True)        # arms detection
        t0 = time.time()
        x = 0.0
        while time.time() - t0 < 600:     # log-silent, CPU-BUSY forever
            x += 1.0
    """))
    sup = Supervisor(
        argv=[sys.executable, str(script)],
        log_path=str(tmp_path / "train.log"),
        resume_args=["--load_model", "tem"],
        check_every=0.2, wedge_secs=0.5, cpu_eps=0.1,
        silent_cap_secs=2.0, term_grace=2.0, max_recoveries=2,
        relay_probe=None)
    assert sup.run() == 0
    assert sup.recoveries == 1
    wedge = next(e for e in sup.events if "WEDGE" in e)
    assert "silent_cap" in wedge
    assert "Model Loaded" in (tmp_path / "train.log").read_text()


def test_crash_relaunches_with_resume(tmp_path):
    sup, _ = make_sup(tmp_path, "crash")
    assert sup.run() == 0
    assert sup.recoveries == 1
    assert "Model Loaded" in (tmp_path / "train.log").read_text()


def test_recovery_budget_exhausts(tmp_path):
    # resume_args that don't change behavior -> the child wedges forever
    sup, _ = make_sup(tmp_path, "wedge", resume_args=[],
                      max_recoveries=2)
    assert sup.run() == 1
    assert sup.recoveries == 3  # budget 2 + the attempt that gave up
    # giving up must not orphan the wedged child (it would keep holding
    # the device/relay); the supervisor terminates it on the way out
    out = subprocess.run(["ps", "-eo", "args"], capture_output=True,
                         text=True).stdout
    assert str(tmp_path / "child.py") not in out


def test_startup_grace_defers_wedge_until_first_output(tmp_path):
    # a child that has not yet produced ANY output is in startup (possibly
    # starved before its SIGTERM handler exists): the wedge window must be
    # max(wedge_secs, startup_grace) there, and plain wedge_secs only after
    # the first log line arms detection
    script = tmp_path / "child.py"
    # never logs, never burns CPU: pre-output wedge path
    script.write_text("import time\ntime.sleep(600)\n")
    sup = Supervisor(
        argv=[sys.executable, str(script)],
        log_path=str(tmp_path / "train.log"),
        resume_args=[], check_every=0.2, wedge_secs=0.5, cpu_eps=0.5,
        startup_grace=3.0, term_grace=2.0, max_recoveries=1,
        relay_probe=None)
    import time as _t
    t0 = _t.time()
    assert sup.run() == 1  # wedges forever; budget 1 exhausts
    first_wedge = next(e for e in sup.events if "WEDGE" in e)
    # the first wedge must not have been declared before startup_grace
    assert _t.time() - t0 >= 3.0
    assert "WEDGE" in first_wedge


def test_child_cpu_seconds_self():
    me = child_cpu_seconds(os.getpid())
    assert me is not None and me > 0
    assert child_cpu_seconds(2 ** 22 + 1234) is None


def test_supervise_main_strips_supervisor_flags(tmp_path, monkeypatch):
    # the child command must not re-enter supervisor mode or keep the
    # supervisor-only flags; resume args come from save_path/ckpt_root
    import sagnn_tpu.train.supervisor as sup_mod

    captured = {}

    class FakeSup:
        def __init__(self, **kw):
            captured.update(kw)

        def run(self):
            return 0

    monkeypatch.setattr(sup_mod, "Supervisor", FakeSup)

    class NS:
        ckpt_root = str(tmp_path)
        save_path = "m1"
        supervise_wedge_secs = 123.0
        supervise_max_recoveries = 4

    raw = ["main.py", "--supervise", "--supervise_wedge_secs", "123",
           "--data", "synthetic", "--supervise_max_recoveries", "4",
           "--epoch", "9"]
    assert sup_mod.supervise_main(NS(), raw) == 0
    assert captured["argv"] == [sys.executable, "main.py", "--data",
                                "synthetic", "--epoch", "9"]
    assert captured["resume_args"] == ["--load_model", "m1"]
    assert captured["wedge_secs"] == 123.0
    assert captured["max_recoveries"] == 4
    assert captured["ckpt_dir"] == os.path.join(str(tmp_path), "m1")


def test_supervise_cli_flag_parses():
    # --supervise must not import jax in the parent; a bad child command
    # exhausts recoveries quickly and exits nonzero without hanging
    r = subprocess.run(
        [sys.executable, "main.py", "--help"], capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=60)
    assert b"--supervise" in r.stdout
