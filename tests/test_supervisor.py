"""Failure detection + auto-restart (tools/train_supervisor.py).

The reference has no recovery story (SURVEY §5); these tests pin the
supervisor's contract: crashes restart with backoff, stalls (silence past
--stall_timeout) are killed and restarted, success passes through, and the
restart budget is honored.
"""

import os
import subprocess
import sys
import textwrap

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

import train_supervisor  # noqa: E402


def _child_script(tmp_path, body: str) -> str:
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    # -S skips site processing: on this machine sitecustomize registers a
    # remote TPU backend in EVERY interpreter (~2.5 s of startup), which
    # would race the short stall_timeouts these tests use. The children
    # only need stdlib; the supervisor contract under test is unchanged.
    return f"{sys.executable} -S {p}"


def test_crash_then_success(tmp_path):
    """Child crashes twice, succeeds on the third attempt; supervisor
    returns 0 after exactly 3 starts."""
    counter = tmp_path / "attempts"
    cmd = _child_script(tmp_path, f"""
        import os, sys
        p = {str(counter)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, "w").write(str(n + 1))
        print("attempt", n + 1, flush=True)
        sys.exit(0 if n >= 2 else 7)
    """)
    code = train_supervisor.run_supervised(
        cmd.split(), max_restarts=5, backoff=0.01)
    assert code == 0
    assert counter.read_text() == "3"


def test_giveup_after_budget(tmp_path):
    cmd = _child_script(tmp_path, """
        import sys
        sys.exit(9)
    """)
    code = train_supervisor.run_supervised(
        cmd.split(), max_restarts=2, backoff=0.01)
    assert code == 9


def test_stall_detection_kills_and_restarts(tmp_path):
    """First attempt prints once then hangs; the supervisor kills it after
    the silence window and the second attempt succeeds."""
    marker = tmp_path / "ran_once"
    cmd = _child_script(tmp_path, f"""
        import os, sys, time
        p = {str(marker)!r}
        if os.path.exists(p):
            print("recovered", flush=True)
            sys.exit(0)
        open(p, "w").write("1")
        print("hanging", flush=True)
        time.sleep(600)
    """)
    code = train_supervisor.run_supervised(
        cmd.split(), max_restarts=2, backoff=0.01, stall_timeout=2.0)
    assert code == 0
    assert marker.exists()


def test_block_buffered_child_is_not_falsely_stalled(tmp_path):
    """A healthy child that prints WITHOUT flushing must not be stall-killed:
    the supervisor launches children with PYTHONUNBUFFERED=1 so piped stdout
    arrives line-by-line instead of in ~8 KB blocks."""
    counter = tmp_path / "starts"
    cmd = _child_script(tmp_path, f"""
        import os, time
        p = {str(counter)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, "w").write(str(n + 1))
        for i in range(5):
            print("step", i)   # deliberately unflushed
            time.sleep(1.0)
    """)
    code = train_supervisor.run_supervised(
        cmd.split(), max_restarts=1, backoff=0.01, stall_timeout=2.5)
    assert code == 0
    assert counter.read_text() == "1"  # never killed/restarted


def test_healthy_window_resets_restart_budget(tmp_path):
    """Crashes separated by healthy runs must not exhaust max_restarts:
    surviving past --healthy_window resets the budget."""
    counter = tmp_path / "starts"
    cmd = _child_script(tmp_path, f"""
        import os, sys, time
        p = {str(counter)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, "w").write(str(n + 1))
        print("up", flush=True)
        time.sleep(0.7)        # outlive the healthy window
        sys.exit(0 if n >= 2 else 3)
    """)
    code = train_supervisor.run_supervised(
        cmd.split(), max_restarts=1, backoff=0.01, stall_timeout=0.0,
        healthy_window=0.5)
    assert code == 0
    # two crashes + final success: needs 3 starts, >1 restart budget
    assert counter.read_text() == "3"


def test_sigint_kills_detached_child(tmp_path):
    """Ctrl-C on the supervisor must not orphan the (own-session) child."""
    import signal
    import time

    pidfile = tmp_path / "child.pid"
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import os, time
        open({str(pidfile)!r}, "w").write(str(os.getpid()))
        print("up", flush=True)
        time.sleep(600)
    """))
    sup = subprocess.Popen(
        [sys.executable, os.path.join(TOOLS, "train_supervisor.py"),
         "--max_restarts", "0", "--cmd", f"{sys.executable} {child}"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 20
        while not pidfile.exists() and time.time() < deadline:
            time.sleep(0.1)
        assert pidfile.exists(), "child never started"
        pid = int(pidfile.read_text())
        time.sleep(0.2)
        sup.send_signal(signal.SIGINT)
        sup.wait(timeout=15)
        # child process group was SIGKILLed by the forwarding handler
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.1)
        else:
            os.kill(pid, 9)
            pytest.fail("child orphaned after supervisor SIGINT")
    finally:
        if sup.poll() is None:
            sup.kill()


def test_cli_passthrough_builds_run_nerf_cmd(tmp_path, capsys):
    """main() with --cmd substitutes the child and forwards the rest."""
    out = tmp_path / "argv"
    cmd = _child_script(tmp_path, f"""
        import sys
        open({str(out)!r}, "w").write(" ".join(sys.argv[1:]))
    """)
    code = train_supervisor.main(
        ["--max_restarts", "0", "--backoff", "0.01", "--cmd", cmd,
         "--", "--config", "x.txt", "--N_iters", "5"])
    assert code == 0
    assert out.read_text() == "--config x.txt --N_iters 5"
