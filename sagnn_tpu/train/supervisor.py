"""Wedge watchdog: automated failure DETECTION + elastic recovery.

SURVEY §5 lists "failure detection / elastic recovery" as a subsystem the
framework must provide. The recovery half (SIGTERM preemption save +
trajectory-exact resume, train/checkpoint.py) was exercised by a real
unplanned relay wedge in round 4 — but detection was a human polling the
log every 10 minutes (the CLAUDE.md runbook). This module closes the loop:
a supervisor process launches the training run, watches it, and executes
the documented recovery automatically.

Reference analog: none — /root/reference has no failure handling at all
(an evicted run loses everything since the last best-NDCG save,
model.py:41-71); this subsystem is framework surface the reference lacks.

Detection criterion (measured in round 4, CLAUDE.md "Hard-won facts"):
a wedged run shows BOTH no new log output AND ~zero child CPU over a
sustained window. Either signal alone is normal — full-sort eval and
multi-GB async d2h staging are log-silent but burn CPU; a long device
step is CPU-quiet but logs on completion — so only the conjunction,
held for `wedge_secs`, declares a wedge.

Recovery sequence (the round-4 runbook, automated):
  1. SIGCONT + SIGTERM the exact child pid. The preemption handler
     (Trainer.install_preemption_handler) runs finalize() FIRST, which
     commits any staged async best-NDCG save host-side (atomic
     tmp->state rename + history/config/rng sidecars) before attempting
     the preemption save — so even if the process then hangs in the
     preemption save's d2h through the dead relay, nothing is lost.
  2. Bounded wait for exit, watching the sidecar mtimes so the commit
     gets time to land; then SIGKILL.
  3. Remove partial `state.tmp*` orbax staging dirs (never `state`).
  4. Probe the relay with a tiny device op in a fresh process (the relay
     recovers once the wedged process dies); retry with backoff.
  5. Relaunch the run with `--load_model <save_path>` — trajectory-exact
     resume re-enters the interrupted epoch with the same batches.

Used via `python main.py --supervise ...` (the supervisor re-execs the
same command line without --supervise as the child) or programmatically
(tests/test_supervisor.py drives it with dummy children).
"""

from __future__ import annotations

import glob
import os
import shutil
import signal
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


def _now() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def child_cpu_seconds(pid: int) -> Optional[float]:
    """Cumulative user+system CPU of `pid` (all threads), from /proc.
    None once the process is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read().decode("ascii", "replace")
    except OSError:
        return None
    # comm may contain spaces/parens: fields start after the LAST ')'
    fields = raw[raw.rfind(")") + 2:].split()
    utime, stime = int(fields[11]), int(fields[12])  # fields 14,15 (1-based)
    hz = os.sysconf("SC_CLK_TCK")
    return (utime + stime) / hz


@dataclass
class Supervisor:
    """Launches `argv` as a supervised child and auto-recovers wedges.

    argv:          the training command (e.g. [sys.executable, "main.py", ...])
    log_path:      child stdout+stderr are appended here; its growth is the
                   progress signal
    ckpt_dir:      the run's checkpoint directory (<ckpt_root>/<save_path>);
                   partial orbax tmp dirs under it are cleaned on recovery
    resume_args:   appended to argv on every relaunch (e.g.
                   ["--load_model", "m1_fullcov"]) unless already present
    check_every:   poll period, seconds
    wedge_secs:    how long the (no-log AND no-CPU) conjunction must hold
    cpu_eps:       total CPU seconds over the quiet window below which the
                   child counts as idle ("~zero CPU")
    term_grace:    max seconds between SIGTERM and SIGKILL
    commit_settle: after a sidecar commit is observed post-SIGTERM, wait
                   this long for further disk writes before SIGKILL
    max_recoveries: give up after this many recoveries (0 = unlimited)
    relay_probe:   shell argv probing the accelerator in a fresh process
                   (None skips — CPU tests); must exit 0 when healthy
    """

    argv: Sequence[str]
    log_path: str
    ckpt_dir: Optional[str] = None
    resume_args: Sequence[str] = ()
    check_every: float = 15.0
    wedge_secs: float = 300.0
    cpu_eps: float = 2.0
    term_grace: float = 300.0
    commit_settle: float = 15.0
    # Before the child's FIRST log output after a (re)launch, require this
    # much quiet instead of wedge_secs (whichever is larger): a freshly
    # exec'd interpreter can be starved to zero CPU on a loaded box before
    # it even installs its SIGTERM handler, and declaring a wedge there
    # SIGTERMs a child whose disposition is still the default (instant
    # death, no preemption save). Production children log within seconds;
    # the cap still catches a child that hangs before its first line.
    startup_grace: float = 60.0
    # Hard backstop on log SILENCE alone: a permanent wedge whose zombie
    # threads trickle MORE than cpu_eps per window (the 131k-run stall
    # measured ~2.4 s/300 s from the relay client retrying) would reset
    # the quiet window forever and never meet the conjunction. Once
    # detection is armed, this much log silence declares a wedge
    # REGARDLESS of CPU — nothing legitimate is log-silent this long
    # (longest observed: multi-GB d2h staging, minutes). None = 6x
    # wedge_secs; <=0 disables.
    silent_cap_secs: Optional[float] = None
    max_recoveries: int = 8
    relay_probe: Optional[Sequence[str]] = (
        sys.executable, "-c",
        "import jax, jax.numpy as jnp; print(float(jnp.ones(()).sum()))")
    relay_probe_timeout: float = 180.0
    env: Optional[dict] = None

    events: List[str] = field(default_factory=list, init=False)
    recoveries: int = field(default=0, init=False)

    # -- logging ----------------------------------------------------------

    def _say(self, msg: str) -> None:
        line = f"{_now()}: [supervisor] {msg}"
        self.events.append(line)
        print(line, file=sys.stderr, flush=True)

    # -- child lifecycle --------------------------------------------------

    def _spawn(self, resume: bool) -> subprocess.Popen:
        argv = list(self.argv)
        if resume and self.resume_args and self.resume_args[0] not in argv:
            argv += list(self.resume_args)
        env = dict(os.environ if self.env is None else self.env)
        env.setdefault("PYTHONUNBUFFERED", "1")  # log growth IS the signal
        logf = open(self.log_path, "ab", buffering=0)
        try:
            child = subprocess.Popen(
                argv, stdout=logf, stderr=subprocess.STDOUT, env=env,
                start_new_session=True)  # own pgid: we kill the exact pid
        finally:
            logf.close()  # child holds its own fd now
        self._say(f"launched pid {child.pid}: {' '.join(map(str, argv))}")
        return child

    def _log_size(self) -> int:
        try:
            return os.stat(self.log_path).st_size
        except OSError:
            return 0

    def _sidecar_mtime(self) -> float:
        """Newest mtime of the commit sidecars (history/config/rng) — the
        observable of a finalize() commit landing on disk."""
        if not self.ckpt_dir:
            return 0.0
        newest = 0.0
        for name in ("history.json", "config.json", "rng.json"):
            try:
                newest = max(newest,
                             os.stat(os.path.join(self.ckpt_dir, name))
                             .st_mtime)
            except OSError:
                pass
        return newest

    def _terminate(self, child: subprocess.Popen) -> None:
        """SIGCONT+SIGTERM -> bounded wait (letting the preemption handler
        commit staged saves) -> SIGKILL."""
        t_term = time.time()
        try:
            os.kill(child.pid, signal.SIGCONT)  # a SIGSTOPped child cannot
            os.kill(child.pid, signal.SIGTERM)  # run its SIGTERM handler
        except ProcessLookupError:
            return
        self._say(f"sent SIGCONT+SIGTERM to pid {child.pid}; waiting up to "
                  f"{self.term_grace:.0f}s for the preemption handler")
        committed_at = None
        size_at_term = self._log_size()
        polls = 0
        while time.time() - t_term < self.term_grace:
            if child.poll() is not None:
                self._say(f"child exited rc={child.returncode} after SIGTERM")
                return
            m = self._sidecar_mtime()
            if m >= t_term:
                committed_at = committed_at or time.time()
                # commit observed: give trailing writes a moment, then stop
                # waiting on the (possibly d2h-hung) preemption save
                if time.time() - committed_at >= self.commit_settle:
                    self._say("sidecar commit observed after SIGTERM; not "
                              "waiting out the preemption save")
                    break
            time.sleep(1.0)
            # Re-CONT every poll: if SIGTERM lands exactly as a stopped
            # child resumes, the kernel sets the interpreter's pending-
            # signal flag but the in-flight opcode (e.g. the drill's own
            # os.kill(SIGSTOP)) re-stops the process before any bytecode
            # boundary — the Python-level handler then never runs and the
            # child sits in T state through the whole grace. A periodic
            # SIGCONT (ignored by a running child) unsticks it within 1 s.
            polls += 1
            try:
                os.kill(child.pid, signal.SIGCONT)
                # If the handler shows NO sign of life (no log output, no
                # sidecar commit), the first SIGTERM may have been consumed
                # around a stop/resume transition without ever reaching the
                # Python-level handler (observed ~1/40 on a loaded box).
                # Re-send it occasionally. Never re-TERM a handler that IS
                # alive — the trainer's handler logs immediately, and a
                # second delivery would re-enter its checkpoint save.
                if (polls % 5 == 0 and committed_at is None
                        and self._log_size() == size_at_term):
                    os.kill(child.pid, signal.SIGTERM)
                    self._say("re-sent SIGTERM (handler silent)")
            except ProcessLookupError:
                pass
        try:
            os.kill(child.pid, signal.SIGKILL)
            self._say(f"SIGKILL pid {child.pid}")
        except ProcessLookupError:
            pass
        child.wait()

    def _clean_tmp(self) -> None:
        """Remove partial orbax staging dirs (`state.tmp*`) — never the
        committed `state`."""
        if not self.ckpt_dir:
            return
        for p in glob.glob(os.path.join(self.ckpt_dir, "state.tmp*")):
            self._say(f"removing partial checkpoint staging dir {p}")
            shutil.rmtree(p, ignore_errors=True)

    def _probe_relay(self) -> bool:
        if self.relay_probe is None:
            return True
        for attempt in range(5):
            try:
                r = subprocess.run(list(self.relay_probe),
                                   capture_output=True,
                                   timeout=self.relay_probe_timeout)
                if r.returncode == 0:
                    self._say(f"relay probe ok (attempt {attempt + 1})")
                    return True
                self._say(f"relay probe rc={r.returncode}: "
                          f"{r.stderr[-200:].decode(errors='replace')}")
            except subprocess.TimeoutExpired:
                self._say("relay probe timed out")
            time.sleep(15.0 * (attempt + 1))
        return False

    # -- main loop --------------------------------------------------------

    def run(self) -> int:
        """Supervise until the child exits 0 (returns 0), recoveries are
        exhausted, or the relay probe never comes back (returns 1)."""
        silent_cap = (6.0 * self.wedge_secs if self.silent_cap_secs is None
                      else self.silent_cap_secs)
        child = self._spawn(resume=False)
        last_size = self._log_size()
        last_cpu = child_cpu_seconds(child.pid) or 0.0
        quiet_since: Optional[float] = None
        silent_since: Optional[float] = None  # resets ONLY on log growth
        cpu_at_quiet = last_cpu
        armed = False  # becomes True at the child's first log output
        while True:
            time.sleep(self.check_every)
            rc = child.poll()
            if rc is not None:
                if rc == 0:
                    self._say("child exited cleanly (rc=0); done")
                    return 0
                self._say(f"child crashed rc={rc}")
                if not self._recover(child, crashed=True):
                    return 1
                child = self._spawn(resume=True)
                last_size = self._log_size()
                last_cpu = child_cpu_seconds(child.pid) or 0.0
                quiet_since, cpu_at_quiet = None, last_cpu
                silent_since = None
                armed = False
                continue
            size = self._log_size()
            cpu = child_cpu_seconds(child.pid)
            cpu = last_cpu if cpu is None else cpu
            progressed = size != last_size
            wedged = None
            if progressed:
                quiet_since = None
                silent_since = None
                armed = True
            else:
                if silent_since is None:
                    silent_since = time.time()
                if quiet_since is None:
                    quiet_since, cpu_at_quiet = time.time(), cpu
                elif cpu - cpu_at_quiet > self.cpu_eps:
                    # log-silent but CPU-active (eval, d2h staging): not
                    # a wedge — unless the silence hard-cap below trips
                    quiet_since, cpu_at_quiet = time.time(), cpu
                elif time.time() - quiet_since >= (
                        self.wedge_secs if armed
                        else max(self.wedge_secs, self.startup_grace)):
                    wedged = (
                        f"WEDGE: no log output and "
                        f"{cpu - cpu_at_quiet:.2f}s CPU over "
                        f"{time.time() - quiet_since:.0f}s "
                        f"(pid {child.pid})")
                if (wedged is None and armed and silent_cap > 0
                        and time.time() - silent_since >= silent_cap):
                    wedged = (
                        f"WEDGE: log silent {time.time() - silent_since:.0f}s"
                        f" >= silent_cap {silent_cap:.0f}s despite CPU "
                        f"activity (pid {child.pid})")
            if wedged is not None:
                self._say(wedged)
                if not self._recover(child, crashed=False):
                    return 1
                child = self._spawn(resume=True)
                last_size = self._log_size()
                last_cpu = child_cpu_seconds(child.pid) or 0.0
                quiet_since, cpu_at_quiet = None, last_cpu
                silent_since = None
                armed = False
                continue
            last_size, last_cpu = size, cpu

    def _recover(self, child: subprocess.Popen, crashed: bool) -> bool:
        self.recoveries += 1
        if self.max_recoveries and self.recoveries > self.max_recoveries:
            self._say(f"recovery budget exhausted "
                      f"({self.max_recoveries}); giving up")
            # don't leave the wedged child holding the device/relay: give
            # its handler one last chance to commit, then make sure it dies
            if child.poll() is None:
                self._terminate(child)
            return False
        self._say(f"recovery {self.recoveries} begins "
                  f"({'crash' if crashed else 'wedge'})")
        if not crashed:
            self._terminate(child)
        self._clean_tmp()
        if not self._probe_relay():
            self._say("relay never recovered; giving up")
            return False
        self._say("recovery complete; relaunching with resume args")
        return True


def supervise_main(ns, raw_argv: Sequence[str]) -> int:
    """Entry for `main.py --supervise`: re-exec the same command line
    without the supervisor flags as the child, resume-args wired from
    --save_path / --ckpt_root."""
    drop = {"--supervise"}
    takes_value = {"--supervise_wedge_secs", "--supervise_max_recoveries"}
    child_argv: List[str] = [sys.executable]
    it = iter(raw_argv)
    for a in it:
        if a in drop:
            continue
        if a in takes_value:
            next(it, None)
            continue
        child_argv.append(a)
    ckpt_dir = os.path.abspath(os.path.join(ns.ckpt_root,
                                            ns.save_path or "tem"))
    os.makedirs(ckpt_dir, exist_ok=True)
    sup = Supervisor(
        argv=child_argv,
        log_path=os.path.join(ckpt_dir, "train.log"),
        ckpt_dir=ckpt_dir,
        resume_args=["--load_model", ns.save_path or "tem"],
        wedge_secs=ns.supervise_wedge_secs,
        max_recoveries=ns.supervise_max_recoveries,
    )
    return sup.run()
