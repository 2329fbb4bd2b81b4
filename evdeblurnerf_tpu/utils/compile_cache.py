"""Persistent XLA compilation cache for fast restarts.

No reference counterpart: the reference (torch eager, run_nerf.py) has no
compile step, so a restart costs nothing but module import. Here every
process start pays XLA compilation of the paper-scale train step and the
eval renderer (~minutes of wall clock on TPU; bench.py is ~4.5 min wall,
almost all of it compile). Training restarts, ``--render_only`` /
``--ft_path`` invocations, and repeated bench runs recompile byte-identical
programs every time.

JAX ships a persistent on-disk compilation cache (serialized PJRT
executables keyed by HLO + compile options + backend topology); this module
is the one place that turns it on, so every entry point (run_nerf.py,
bench.py, tools/) resolves the same directory and the same escape hatches:

- ``--compilation_cache_dir auto`` (the default) caches under
  ``$EVDN_COMPILE_CACHE_DIR`` or ``~/.cache/evdeblurnerf_tpu/xla-cache``;
- ``--compilation_cache_dir <path>`` pins an explicit directory (e.g. a
  shared NFS path on a pod — the cache is multi-process safe: entries are
  written via atomic rename, and each host simply hits or misses);
- ``--compilation_cache_dir none`` or ``EVDN_DISABLE_COMPILE_CACHE=1``
  disables it (e.g. for clean compile-time measurements).

Backends that cannot serialize executables degrade gracefully: JAX logs a
warning per program and compiles as usual, so enabling the cache is never
a correctness risk.
"""

from __future__ import annotations

import os

DISABLE_ENV = "EVDN_DISABLE_COMPILE_CACHE"
DIR_ENV = "EVDN_COMPILE_CACHE_DIR"
_OFF_VALUES = ("", "none", "off", "0", "false")


def default_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "evdeblurnerf_tpu", "xla-cache")


def resolve_dir(cache_dir: str = "auto") -> str | None:
    """The directory ``enable`` would use, or None if caching is off."""
    if os.environ.get(DISABLE_ENV, "").strip().lower() not in _OFF_VALUES:
        return None
    if cache_dir is None or str(cache_dir).strip().lower() in _OFF_VALUES:
        return None
    if cache_dir == "auto":
        return os.environ.get(DIR_ENV) or default_dir()
    return os.path.expanduser(cache_dir)


def enable(cache_dir: str = "auto") -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; call before the first compilation (later calls still work
    but already-compiled programs were not cached). Returns the resolved
    directory, or None when disabled. Never raises: an unusable directory
    downgrades to a warning and leaves caching off.

    ``auto`` activates only on accelerator backends: XLA:CPU AOT reloads
    log a spurious machine-feature mismatch ("could lead to SIGILL") per
    program, and CPU executables genuinely are host-ISA-specific, so a
    shared/home cache dir is unsafe to reuse across machines. CPU runs
    that want the cache (e.g. same-machine restart loops) pass an explicit
    directory or set the env dir.
    """
    resolved = resolve_dir(cache_dir)
    if resolved is None:
        return None
    import jax

    if (cache_dir == "auto" and DIR_ENV not in os.environ
            and jax.default_backend() == "cpu"):
        return None

    try:
        os.makedirs(resolved, exist_ok=True)
        changed = jax.config.jax_compilation_cache_dir != resolved
        jax.config.update("jax_compilation_cache_dir", resolved)
        if changed:
            # jax latches its cache object to the directory seen at first
            # use; without a reset, a dir change after any compilation
            # silently keeps writing to the old directory
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc)

            _cc.reset_cache()
    except Exception as exc:  # unwritable dir, read-only fs, ...
        import warnings

        warnings.warn(
            f"persistent compilation cache disabled: cannot use "
            f"{resolved!r} ({exc}); set --compilation_cache_dir or "
            f"{DIR_ENV} to a writable path, or 'none' to silence this")
        return None
    return resolved
