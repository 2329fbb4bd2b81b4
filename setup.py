"""Builds the optional C++ host-kernel extension alongside the package.

All metadata lives in pyproject.toml; this file only adds the native
events-scan library (evdeblurnerf_tpu/ops/events_cpp/events.cpp, plain C
ABI loaded via ctypes). The extension is marked optional: on a machine
without a C++ toolchain the install still succeeds and the package uses
its vectorized numpy fallbacks (ops/events_native.py). In a source
checkout the Makefile self-build in events_native.py takes precedence.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            # placed next to the sources so the ctypes loader's
            # libevents*.so glob finds it in installed trees
            "evdeblurnerf_tpu.ops.events_cpp.libevents",
            sources=["evdeblurnerf_tpu/ops/events_cpp/events.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
)
