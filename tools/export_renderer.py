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
    # thin wrapper: the packaged CLI (``evdn-export``) carries the logic
    from evdeblurnerf_tpu.cli import export_main

    export_main()


if __name__ == "__main__":
    main()
