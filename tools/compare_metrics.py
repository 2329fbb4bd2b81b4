#!/usr/bin/env python
"""Align two validate_train runs' test_metrics.txt into one delta table.

Used for the matched cull-vs-exact screens (PERF_NOTES rounds 4-5):
``python tools/compare_metrics.py /tmp/boxes_exact/vtrain /tmp/boxes_cull/vtrain``
prints per-checkpoint PSNR/SSIM/LPIPS for both runs plus the (B - A)
delta, so the screen tables in PERF_NOTES.md are copy-paste reproducible.
"""

import argparse
import os
import re


def load(run_dir):
    path = os.path.join(run_dir, "test_metrics.txt")
    rows = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"iter (\d+):", line)
            if not m:
                continue
            vals = dict(re.findall(r"(\w+)=([0-9.eE+-]+)", line))
            rows[int(m.group(1))] = {k: float(v) for k, v in vals.items()
                                     if k != "lpips_trunk"}
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a", help="baseline run dir (contains test_metrics.txt)")
    ap.add_argument("run_b", help="treatment run dir")
    args = ap.parse_args()
    a, b = load(args.run_a), load(args.run_b)
    iters = sorted(set(a) & set(b))
    print(f"{'iter':>6} | {'A psnr/ssim/lpips':>28} | "
          f"{'B psnr/ssim/lpips':>28} | {'dPSNR':>7} {'dSSIM':>8}")
    for i in iters:
        ra, rb = a[i], b[i]
        print(f"{i:>6} | {ra['psnr']:>9.3f} {ra['ssim']:.4f} "
              f"{ra['lpips']:.5f} | {rb['psnr']:>9.3f} {rb['ssim']:.4f} "
              f"{rb['lpips']:.5f} | {rb['psnr']-ra['psnr']:>+7.3f} "
              f"{rb['ssim']-ra['ssim']:>+8.4f}")


if __name__ == "__main__":
    main()
