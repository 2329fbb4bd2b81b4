#!/usr/bin/env python
"""Export a trained experiment as a self-contained serving artifact.

Builds the model exactly as training would (same config + dataset-derived
camera/AABB), restores the latest checkpoint (or ``--ft_path``), and
AOT-exports the eval render program — weights baked in, rgb CRF folded —
to one ``.evdnsrv`` file (``evdeblurnerf_tpu/serving.py``). Serving then
needs only JAX + the loader: no model code, config, or checkpoint tree.

The artifact is compiled for THIS process's backend (run under the TPU
backend to serve on TPU; the platform list is recorded in the header and
enforced at load time by jax.export).

Usage:
  python tools/export_renderer.py --config configs/<exp>.txt \
      --out scene.evdnsrv [--export_chunk 32768]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins the
# backend via jax.config (the env var alone is silently overridden there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument("--export_chunk", type=int, default=32768,
                    help="fixed rays-per-call chunk baked into the program")
    ap.add_argument("--export_devices", type=int, default=1,
                    help="export data-parallel over this many devices "
                         "(rays sharded; the artifact then requires exactly "
                         "this many devices at serving time)")
    cli, rest = ap.parse_known_args()

    from evdeblurnerf_tpu import config, serving
    from evdeblurnerf_tpu.utils import compile_cache

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
