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
    return f"{sys.executable} {p}"


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
