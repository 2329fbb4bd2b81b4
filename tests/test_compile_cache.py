"""Persistent XLA compilation cache (utils/compile_cache.py).

The cache is what makes restarts/resumes/render-only runs skip minutes of
recompilation (no reference counterpart: torch eager has no compile step).
These tests pin the resolution rules (flag value, env overrides, disable
spellings) and that enabling it actually produces cache entries for a
jitted program.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from evdeblurnerf_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv(compile_cache.DISABLE_ENV, raising=False)
    monkeypatch.delenv(compile_cache.DIR_ENV, raising=False)


def test_resolve_rules(monkeypatch, tmp_path):
    assert compile_cache.resolve_dir("auto") == compile_cache.default_dir()
    assert compile_cache.resolve_dir(str(tmp_path)) == str(tmp_path)
    for off in ("none", "NONE", "off", "", "0", None):
        assert compile_cache.resolve_dir(off) is None
    monkeypatch.setenv(compile_cache.DIR_ENV, "/tmp/elsewhere")
    assert compile_cache.resolve_dir("auto") == "/tmp/elsewhere"
    # explicit path wins over the env dir
    assert compile_cache.resolve_dir(str(tmp_path)) == str(tmp_path)
    monkeypatch.setenv(compile_cache.DISABLE_ENV, "1")
    assert compile_cache.resolve_dir("auto") is None
    assert compile_cache.resolve_dir(str(tmp_path)) is None
    monkeypatch.setenv(compile_cache.DISABLE_ENV, "0")
    assert compile_cache.resolve_dir("auto") is not None


def test_enable_populates_cache(tmp_path):
    d = str(tmp_path / "xla-cache")
    prev = jax.config.jax_compilation_cache_dir
    prev_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_s = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        assert compile_cache.enable(d) == d
        # thresholds keep tiny programs out of the cache by default; force
        # this small test program in
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        x = jnp.arange(64.0).reshape(8, 8)
        jax.jit(lambda a: jnp.sin(a) @ a.T)(x).block_until_ready()
        assert os.listdir(d), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_s)


def test_auto_stays_off_on_cpu_backend(tmp_path, monkeypatch):
    """'auto' only activates on accelerators (XLA:CPU AOT reloads warn per
    program and CPU executables are host-ISA-specific); an explicit dir or
    the env dir still opts a CPU run in."""
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert jax.default_backend() == "cpu"
        assert compile_cache.enable("auto") is None
        d = str(tmp_path / "explicit")
        assert compile_cache.enable(d) == d
        monkeypatch.setenv(compile_cache.DIR_ENV, str(tmp_path / "envd"))
        assert compile_cache.enable("auto") == str(tmp_path / "envd")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_enable_disabled_and_bad_dir(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert compile_cache.enable("none") is None
        monkeypatch.setenv(compile_cache.DISABLE_ENV, "1")
        assert compile_cache.enable(str(tmp_path)) is None
        monkeypatch.delenv(compile_cache.DISABLE_ENV)
        # unwritable parent: warns, returns None, does not raise
        blocker = tmp_path / "file"
        blocker.write_text("x")
        with pytest.warns(UserWarning, match="compilation cache disabled"):
            assert compile_cache.enable(str(blocker / "sub")) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_flag_exists_and_threads_through():
    from evdeblurnerf_tpu.config import default_args

    args = default_args()
    assert args.compilation_cache_dir == "auto"
    args2 = default_args(compilation_cache_dir="none")
    assert compile_cache.resolve_dir(args2.compilation_cache_dir) is None


def test_redirect_after_first_use(tmp_path):
    """jax latches its cache object to the dir seen at first use; enable()
    must reset it so a later dir change actually takes effect (this was a
    real ordering flake: a prior auto-enable pinned the home cache dir and
    the explicit-dir test wrote nothing to its tmp dir)."""
    prev = jax.config.jax_compilation_cache_dir
    prev_t = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_s = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        assert compile_cache.enable(a) == a
        jax.jit(lambda x: jnp.cos(x) @ x.T)(
            jnp.ones((16, 16))).block_until_ready()
        assert os.listdir(a)
        assert compile_cache.enable(b) == b
        jax.jit(lambda x: jnp.tan(x) @ x.T)(
            jnp.ones((16, 16))).block_until_ready()
        assert os.listdir(b), "cache still latched to the first dir"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_s)
