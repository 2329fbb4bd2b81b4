"""bench.py backend-unavailable fallback.

When no backend answers within the deadline, bench.py must either emit
the LAST real measurement clearly labeled ``stale: true`` (never a
fabricated number) or exit 3 when none was ever recorded.
"""

import importlib.util
import io
import contextlib
import json
import os

import pytest

pytestmark = pytest.mark.fast

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stale_fallback_emits_labeled_last_measurement(tmp_path):
    b = _load_bench()
    b._LAST_BENCH = str(tmp_path / "LAST_BENCH.json")

    with pytest.raises(SystemExit) as e:
        b._emit_stale_or_die("nothing recorded")
    assert e.value.code == 3  # no prior measurement -> hard failure

    rec = {"metric": "train_rays_per_sec_full_step", "value": 123.0,
           "unit": "rays/s", "vs_baseline": 0.5}
    json.dump(rec, open(b._LAST_BENCH, "w"))
    buf = io.StringIO()
    with pytest.raises(SystemExit) as e, contextlib.redirect_stdout(buf):
        b._emit_stale_or_die("tunnel down")
    assert e.value.code == 0
    out = json.loads(buf.getvalue())
    assert out["stale"] is True
    assert out["value"] == 123.0
    assert "tunnel down" in out["stale_reason"]


def test_deadline_kill_emits_stale_payload(tmp_path, monkeypatch):
    """Round-4 postmortem (BENCH_r04.json rc=124, parsed=null): the driver
    deadline-killing the measurement must STILL leave one JSON line on
    stdout. Simulate by giving the parent a ~zero budget — the worker
    (which would wait on the backend) is killed and the labeled-stale
    prior measurement is printed."""
    import subprocess
    import sys

    last = tmp_path / "LAST_BENCH.json"
    rec = {"metric": "train_rays_per_sec_full_step", "value": 321.0,
           "unit": "rays/s", "vs_baseline": 0.7}
    json.dump(rec, open(last, "w"))
    # point the module at the tmp LAST_BENCH without touching the repo's:
    # run a tiny driver that rebinds _LAST_BENCH then calls main()
    code = (
        "import importlib.util, sys\n"
        f"spec = importlib.util.spec_from_file_location('b', "
        f"{os.path.join(ROOT, 'bench.py')!r})\n"
        "b = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(b)\n"
        f"b._LAST_BENCH = {str(last)!r}\n"
        "sys.argv = ['bench.py']\n"
        "b.main()\n")
    env = {**os.environ, "BENCH_BUDGET_S": "2",
           "BENCH_BACKEND_DEADLINE_S": "1", "BENCH_BACKEND_PROBE_S": "1"}
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-800:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["stale"] is True
    assert out["value"] == 321.0


def test_worker_flushes_train_payload_before_eval(tmp_path):
    """run(on_train=...) must hand the train throughput out before the
    eval measurement begins, and the payload builder must label a missing
    eval number rather than inventing one."""
    b = _load_bench()
    p = b._build_payload(50_000.0, None, "TPU v5 lite", 0.25)
    assert p["value"] == 50000.0
    assert p["eval_rays_per_sec"] is None
    assert p["vs_baseline"] == round(50000.0 / 36864.0, 3)
    assert p["roofline_fraction"] == round(50000.0 / 380000.0, 3)


def test_committed_last_bench_is_valid_json():
    p = os.path.join(ROOT, "LAST_BENCH.json")
    rec = json.load(open(p))
    assert rec["metric"] == "train_rays_per_sec_full_step"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert "measured_utc" in rec
