"""EvDeblurNeRF-TPU: a TPU-native JAX framework for event-based motion-deblur NeRF.

A from-scratch rebuild of the capabilities of uzh-rpg/EvDeblurNeRF (CVPR 2024,
"Mitigating Motion Blur in Neural Radiance Fields with Events and Frames"),
designed TPU-first:

* the entire per-iteration compute (ray expansion through blur kernels,
  coarse-to-fine tri-plane field evaluation, volumetric compositing, CRF
  tonemapping, EGM event loss, gradients and the optimizer update) compiles
  into a single XLA program via ``jax.jit`` over a ``jax.sharding.Mesh``;
* host-side sequential/scan algorithms (event successor graph, accumulation)
  are implemented in C++ (ctypes) with vectorized numpy fallbacks;
* data loading is an ahead-of-time preprocessing + background prefetch
  pipeline emitting fixed-shape device batches (no dynamic shapes in jit).

Reference parity citations in docstrings use ``ref:`` file:line paths into
the upstream repository.
"""

__version__ = "0.1.0"
