#!/usr/bin/env python
"""Failure detection + automatic restart for long training runs.

The reference has no elastic-recovery story (SURVEY §5: "failure
detection: none" — a crashed run is restarted by hand and re-pays full
startup). This supervisor closes that gap around the existing resume
machinery: training already auto-resumes from the latest checkpoint
(train/checkpoint.py) and the persistent compilation cache
(utils/compile_cache.py) makes a restart cost seconds instead of minutes,
so the supervisor only has to *detect* failure and relaunch.

Two failure modes are detected:

- **crash**: the child exits nonzero (OOM, preemption, assertion, a
  dropped remote-backend connection that surfaces as an exception);
- **stall**: no child output for ``--stall_timeout`` seconds (a wedged
  device tunnel or deadlocked host thread hangs forever without exiting;
  the train loop prints at the i_print cadence, so prolonged silence is
  the liveness signal). The child runs in its own session and its process
  group alone is killed — nothing is matched by name or pattern.

Restarts use exponential backoff (``--backoff``, doubling, capped at 5
min) up to ``--max_restarts``; then the supervisor gives up with the
child's exit code. Supervisor events are one-line JSON records on stderr.

Usage::

    python tools/train_supervisor.py [supervisor flags] -- \
        --config configs/exp.txt [run_nerf flags...]

Everything after the flags is passed to ``run_nerf.py`` verbatim
(``--cmd`` substitutes a different child command line, e.g. for tests).
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import signal
import subprocess
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _event(**kw):
    print(json.dumps({"supervisor": True, **kw}), file=sys.stderr, flush=True)


def run_supervised(cmd, max_restarts=5, backoff=10.0, stall_timeout=0.0,
                   healthy_window=1800.0, _sleep=time.sleep) -> int:
    """Run ``cmd`` under supervision; returns the final exit code.

    ``healthy_window``: a child that survives this many seconds resets the
    restart budget and backoff — occasional transient crashes over a
    multi-hour run must not permanently exhaust ``max_restarts``.
    """
    attempt = 0
    while True:
        attempt += 1
        started = time.monotonic()
        last_output = [started]
        _event(event="start", attempt=attempt, cmd=cmd)
        # Liveness is read from the child's piped stdout; without -u the
        # child would block-buffer (~8 KB) when piped and healthy runs
        # would look silent for many i_print intervals.
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        child = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            start_new_session=True,  # own session: killpg touches only it
            env=env)

        def _kill_child(signum=None, frame=None):
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            if signum is not None:  # re-raise default behaviour
                signal.signal(signum, signal.SIG_DFL)
                os.kill(os.getpid(), signum)

        # The child's own session means terminal SIGINT no longer reaches
        # it; forward supervisor termination so no orphan holds the device.
        prev_int = signal.signal(signal.SIGINT, _kill_child)
        prev_term = signal.signal(signal.SIGTERM, _kill_child)

        def pump(stream=child.stdout):
            for line in iter(stream.readline, b""):
                last_output[0] = time.monotonic()
                sys.stdout.buffer.write(line)
                sys.stdout.buffer.flush()

        t = threading.Thread(target=pump, daemon=True)
        t.start()

        stalled = False
        try:
            while True:
                try:
                    code = child.wait(timeout=1.0)
                    break
                except subprocess.TimeoutExpired:
                    silent = time.monotonic() - last_output[0]
                    if (stall_timeout > 0 and silent > stall_timeout
                            and child.poll() is None):
                        stalled = True
                        _event(event="stall", attempt=attempt,
                               silent_s=round(silent, 1))
                        _kill_child()
                        code = child.wait()
                        break
            t.join(timeout=5.0)
        finally:
            signal.signal(signal.SIGINT, prev_int)
            signal.signal(signal.SIGTERM, prev_term)

        # code == 0 wins even when the stall flag was raced by a normal
        # exit (last print -> long final checkpoint save -> exit 0): a
        # finished run must not be relaunched.
        if code == 0:
            _event(event="done", attempt=attempt)
            return 0
        if healthy_window > 0 and time.monotonic() - started > healthy_window:
            _event(event="budget_reset", attempt=attempt,
                   ran_s=round(time.monotonic() - started, 1))
            attempt = 0
        reason = "stall" if stalled else f"exit={code}"
        if attempt > max_restarts:
            _event(event="giveup", attempt=attempt, reason=reason)
            return code if code != 0 else 1
        delay = min(backoff * (2 ** max(attempt - 1, 0)), 300.0)
        _event(event="restart", attempt=attempt, reason=reason,
               backoff_s=round(delay, 1))
        _sleep(delay)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--max_restarts", type=int, default=5)
    ap.add_argument("--backoff", type=float, default=10.0,
                    help="first restart delay in seconds (doubles each "
                         "retry, capped at 300)")
    ap.add_argument("--stall_timeout", type=float, default=0.0,
                    help="kill + restart after this many seconds without "
                         "child output (0 = disabled). Size it to several "
                         "i_print intervals")
    ap.add_argument("--healthy_window", type=float, default=1800.0,
                    help="a child that survives this long resets the "
                         "restart budget (0 = never reset)")
    ap.add_argument("--cmd", default=None,
                    help="child command line (shlex-split) instead of "
                         "'python run_nerf.py <rest>'")
    cli, rest = ap.parse_known_args(argv)
    if rest and rest[0] == "--":
        rest = rest[1:]
    if cli.cmd:
        cmd = shlex.split(cli.cmd) + rest
    else:
        cmd = [sys.executable,
               os.path.join(REPO_ROOT, "run_nerf.py")] + rest
    return run_supervised(cmd, max_restarts=cli.max_restarts,
                          backoff=cli.backoff,
                          stall_timeout=cli.stall_timeout,
                          healthy_window=cli.healthy_window)


if __name__ == "__main__":
    raise SystemExit(main())
