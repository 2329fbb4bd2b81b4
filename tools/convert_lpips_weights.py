#!/usr/bin/env python
"""Convert a torchvision AlexNet checkpoint into the LPIPS weight bundle.

For machines that HAVE the ImageNet AlexNet trunk (torchvision download or
an offline copy), this restores published-comparable LPIPS(alex) — the
reference loads the same trunk via torchvision
(ref: networks/lpips/pretrained_networks.py:14-40) plus its vendored v0.1
lin heads (ref: networks/lpips/weights/v0.1/alex.pth, already converted and
shipped at evdeblurnerf_tpu/models/lpips_weights/alex_lin_v0.1.npz).

The checkpoint is checksum-verified before conversion: torch-hub filenames
embed the first 8 hex digits of the file's SHA-256
(``alexnet-owt-<8hex>.pth``), and torchvision's published AlexNet is
``alexnet-owt-7be5be79.pth``. A mismatching digest aborts — a silently
wrong trunk would poison every persisted lpips value while still being
labeled ``lpips_trunk=pretrained``.

Usage:
    python tools/convert_lpips_weights.py [--alexnet PATH] [--out PATH]
           [--lin PATH]

With no --alexnet, the usual torch-hub cache locations are probed. The
default --out is the package's full-bundle path, which LPIPSScorer picks up
automatically on the next run.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from evdeblurnerf_tpu.models.lpips import (_FULL_BUNDLE,  # noqa: E402
                                           LPIPSScorer,
                                           convert_torch_weights)

# torchvision's published AlexNet (https://download.pytorch.org/models/)
KNOWN_SHA256_PREFIX = "7be5be79"


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def find_alexnet() -> str | None:
    hub = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache",
                                   "torch"))
    cands = glob.glob(os.path.join(hub, "hub", "checkpoints",
                                   "alexnet-owt-*.pth"))
    return cands[0] if cands else None


def verify_checksum(path: str, allow_unknown: bool) -> None:
    digest = sha256_of(path)
    m = re.search(r"alexnet-owt-([0-9a-f]{8})\.pth$", os.path.basename(path))
    expected = m.group(1) if m else KNOWN_SHA256_PREFIX
    if not digest.startswith(expected):
        raise SystemExit(
            f"checksum mismatch: sha256({path}) = {digest[:16]}…, expected "
            f"prefix {expected} (torch-hub filename convention). Refusing "
            f"to convert a tampered/corrupt trunk.")
    if expected != KNOWN_SHA256_PREFIX and not allow_unknown:
        raise SystemExit(
            f"{os.path.basename(path)} is self-consistent but is NOT the "
            f"published torchvision AlexNet (alexnet-owt-"
            f"{KNOWN_SHA256_PREFIX}.pth). Pass --allow-unknown-trunk to "
            f"convert it anyway (lpips values will then depend on that "
            f"trunk, not the published one).")
    print(f"checksum ok: {digest[:16]}… (prefix {expected})")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--alexnet", default=None,
                    help="path to alexnet-owt-*.pth (default: probe the "
                         "torch-hub cache)")
    ap.add_argument("--lin", default=None,
                    help="optional torch-format LPIPS v0.1 lin-head file "
                         "(e.g. an upstream checkout's weights/v0.1/"
                         "alex.pth); default: the vendored converted heads")
    ap.add_argument("--out", default=_FULL_BUNDLE,
                    help=f"output npz bundle (default: {_FULL_BUNDLE})")
    ap.add_argument("--allow-unknown-trunk", action="store_true",
                    help="accept a checkpoint whose filename hash is "
                         "self-consistent but not the published one")
    args = ap.parse_args()

    alexnet = args.alexnet or find_alexnet()
    if alexnet is None or not os.path.exists(alexnet):
        raise SystemExit(
            "no AlexNet checkpoint found. Download torchvision's "
            "alexnet-owt-7be5be79.pth (e.g. `torchvision.models.alexnet("
            "weights='IMAGENET1K_V1')` on a connected machine, which caches "
            "it under ~/.cache/torch/hub/checkpoints/) and pass --alexnet.")
    verify_checksum(alexnet, args.allow_unknown_trunk)

    convert_torch_weights(alexnet, args.lin, args.out)
    scorer = LPIPSScorer.from_npz(args.out)
    a = (abs(__import__("numpy").random.default_rng(0)
             .normal(size=(35, 35, 3))) % 1.0) * 2 - 1
    d = scorer(a, -a)
    print(f"wrote {args.out}; smoke distance(x, -x) = {d:.4f} "
          f"(trunk: pretrained)")


if __name__ == "__main__":
    main()
