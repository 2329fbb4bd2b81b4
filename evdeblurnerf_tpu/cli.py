"""Console entry points (``evdn-train``, ``evdn-export``; also
``python run_nerf.py`` / ``python tools/export_renderer.py``).

Reference-compatible flag surface and config files (ref: run_nerf.py,
options.py); the lifecycle lives in :mod:`evdeblurnerf_tpu.train.loop`,
serving export in :mod:`evdeblurnerf_tpu.serving`.
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


def export_main(argv=None):
    """``evdn-export``: trained experiment -> one self-contained serving
    artifact (AOT-compiled render program, weights baked in; see
    :mod:`evdeblurnerf_tpu.serving`)."""
    import argparse

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser(
        prog="evdn-export",
        description="Export a trained experiment as a self-contained "
                    ".evdnsrv serving artifact (compiled for THIS "
                    "process's backend). Remaining flags are the "
                    "experiment config, e.g. --config configs/exp.txt.")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--export_chunk", type=int, default=32768,
                    help="fixed rays-per-call chunk baked into the program")
    ap.add_argument("--export_devices", type=int, default=1,
                    help="export data-parallel over this many devices "
                         "(rays sharded; the artifact then requires exactly "
                         "this many devices at serving time)")
    cli, rest = ap.parse_known_args(argv)

    from . import config, serving
    from .utils import compile_cache

    args = config.parse_args(rest)
    compile_cache.enable(getattr(args, "compilation_cache_dir", "auto"))
    meta = serving.export_experiment(args, cli.out, chunk=cli.export_chunk,
                                     devices=cli.export_devices)
    size = os.path.getsize(cli.out)
    print(f"wrote {cli.out} ({size / 1e6:.1f} MB, step={meta['step']}, "
          f"chunk={cli.export_chunk}, devices={meta['nr_devices']}, "
          f"platforms={meta['platforms']})")


if __name__ == "__main__":
    main()
