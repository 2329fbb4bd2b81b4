"""jax-version compatibility for shard_map.

Two renames are papered over in one place so every call site stays
identical across jax versions: the import location (top-level since
jax 0.5, experimental before) and the replication-check kwarg
(``check_vma`` now, ``check_rep`` before).
"""

from __future__ import annotations

import inspect

try:  # jax >= 0.5 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _norep_kwarg() -> str:
    try:
        params = inspect.signature(_shard_map).parameters
        if "check_vma" in params:
            return "check_vma"
        if "check_rep" in params:
            return "check_rep"
    except (TypeError, ValueError):  # pragma: no cover — exotic wrappers
        pass
    return "check_vma"


_NOREP = _norep_kwarg()


def shard_map_norep(fn, **kwargs):
    """``shard_map`` with replication checking disabled (our kernels use
    explicit psum/row sharding; the checker rejects several valid
    patterns)."""
    kwargs[_NOREP] = False
    try:
        return _shard_map(fn, **kwargs)
    except TypeError:  # pragma: no cover — signature probe was wrong
        other = "check_rep" if _NOREP == "check_vma" else "check_vma"
        kwargs[other] = kwargs.pop(_NOREP)
        return _shard_map(fn, **kwargs)
