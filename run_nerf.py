#!/usr/bin/env python
"""CLI entry point: ``python run_nerf.py --config configs/<exp>.txt [...]``.

Same command-line surface as the reference's run_nerf.py; delegates to the
packaged console entry (``evdeblurnerf_tpu.cli``, installed as
``evdn-train``).
"""

from evdeblurnerf_tpu.cli import main

if __name__ == "__main__":
    main()
