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


def test_committed_last_bench_is_valid_json():
    p = os.path.join(ROOT, "LAST_BENCH.json")
    rec = json.load(open(p))
    assert rec["metric"] == "train_rays_per_sec_full_step"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert "measured_utc" in rec
