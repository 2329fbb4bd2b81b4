"""Packaging consistency (pyproject.toml / setup.py / cli entry point).

The wheel itself is built and smoke-tested out of band (pip wheel +
install into a target dir, native-loader glob fallback exercised); these
tests pin what can drift silently in-tree.
"""

import os

import pytest

tomllib = pytest.importorskip("tomllib")  # stdlib only on python >= 3.11

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_matches_package(pyproject):
    import evdeblurnerf_tpu

    assert pyproject["project"]["version"] == evdeblurnerf_tpu.__version__


def test_console_script_resolves(pyproject):
    import importlib

    for name, target in pyproject["project"]["scripts"].items():
        mod, _, fn = target.partition(":")
        obj = getattr(importlib.import_module(mod), fn)
        assert callable(obj), f"{name} -> {target} not callable"


def test_package_data_files_exist(pyproject):
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]
    import glob

    for pkg, patterns in pkg_data.items():
        base = os.path.join(ROOT, *pkg.split("."))
        for pat in patterns:
            assert glob.glob(os.path.join(base, pat)), (pkg, pat)


def test_cli_module_parses_reference_config():
    """run_nerf.py delegates to cli.main; the parser behind it accepts the
    reference config format (full e2e covered by test_train)."""
    from evdeblurnerf_tpu.config import parse_args

    cfgs = "/root/reference/configs"
    if not os.path.isdir(cfgs):
        pytest.skip("reference configs unavailable")
    import glob

    one = sorted(glob.glob(os.path.join(cfgs, "**", "*.txt"),
                           recursive=True))[0]
    args = parse_args(["--config", one])
    assert args.expname


def test_help_prints_flags_and_exits_zero(capsys):
    from evdeblurnerf_tpu.config import parse_args

    with pytest.raises(SystemExit) as e:
        parse_args(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--N_rand" in out and "--compilation_cache_dir" in out
