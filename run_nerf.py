#!/usr/bin/env python
"""CLI entry point: ``python run_nerf.py --config configs/<exp>.txt [...]``.

Reference-compatible flag surface and config files (ref: run_nerf.py,
options.py); the lifecycle lives in evdeblurnerf_tpu.train.loop.
"""

import os

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins the
# backend via jax.config (the env var alone is silently overridden there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from evdeblurnerf_tpu.config import parse_args
from evdeblurnerf_tpu.train.loop import train


def main():
    args = parse_args()
    if getattr(args, "multihost", False):
        # must run before anything touches a backend (jax.devices/jit)
        from evdeblurnerf_tpu.parallel import multihost

        multihost.initialize()
        if not multihost.is_primary():
            import sys

            sys.stdout = open(os.devnull, "w")  # side-effect-free workers
    print("RANDOM SEED", args.seed)
    train(args)


if __name__ == "__main__":
    main()
