"""Console entry point (``evdn-train``; also ``python run_nerf.py``).

Reference-compatible flag surface and config files (ref: run_nerf.py,
options.py); the lifecycle lives in :mod:`evdeblurnerf_tpu.train.loop`.
"""

from __future__ import annotations

import os


def main(argv=None):
    # honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins
    # the backend via jax.config (the env var alone is silently overridden
    # there)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from .config import parse_args
    from .train.loop import train

    args = parse_args(argv)
    if getattr(args, "multihost", False):
        # must run before anything touches a backend (jax.devices/jit)
        from .parallel import multihost

        multihost.initialize()
        if not multihost.is_primary():
            import sys

            sys.stdout = open(os.devnull, "w")  # side-effect-free workers
    print("RANDOM SEED", args.seed)
    train(args)


if __name__ == "__main__":
    main()
