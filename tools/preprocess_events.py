#!/usr/bin/env python
"""Offline event-stream preprocessing CLI.

Builds the per-pixel successor graph (C++ scan kernels) ahead of training
and writes it as an ``events_successor.npz`` sidecar next to ``events.h5``;
the dataset loader picks it up automatically and skips the startup scan
(useful for 1e8+-event captures). Optionally emits polarity accumulations
(count-based and timestamp-grid, ref: utils/events.py:123-218 — utilities
the reference defines but never calls in training).

    python tools/preprocess_events.py <scene_dir> [--h H --w W]
        [--events_tms_unit ns|us] [--accumulate N] [--accumulate_at_time N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evdeblurnerf_tpu.ops.events_native import (accumulate_events,  # noqa: E402
                                                accumulate_events_at_time,
                                                compute_successor,
                                                native_available)
from evdeblurnerf_tpu.utils.events import load_events_h5  # noqa: E402


def infer_hw(basedir: str):
    import imageio.v2 as imageio

    imgdir = os.path.join(basedir, "images_1")
    if not os.path.isdir(imgdir):
        imgdir = os.path.join(basedir, "images")
    f = next(f for f in sorted(os.listdir(imgdir))
             if f.lower().endswith(("png", "jpg", "jpeg")))
    h, w = imageio.imread(os.path.join(imgdir, f)).shape[:2]
    return h, w


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scene_dir")
    p.add_argument("--h", type=int, default=None)
    p.add_argument("--w", type=int, default=None)
    p.add_argument("--events_tms_unit", default="ns", choices=["ns", "us"])
    p.add_argument("--accumulate", type=int, default=0,
                   help="also write count-based accumulation (every N)")
    p.add_argument("--accumulate_at_time", type=int, default=0,
                   help="also write timestamp-grid accumulation (every N+1 "
                        "image timestamps)")
    args = p.parse_args()

    h, w = (args.h, args.w) if args.h and args.w else infer_hw(args.scene_dir)
    print(f"scene {args.scene_dir} ({h}x{w}); "
          f"native kernels: {native_available()}")

    events, zero_ids, id_to_coords = load_events_h5(
        os.path.join(args.scene_dir, "events.h5"), h, w,
        optimize_ids=True, events_tms_unit=args.events_tms_unit)
    # same known-pose time filter the loader applies
    # (ref: data/loader_events.py:193)
    tms_path = os.path.join(args.scene_dir, "all_timestamps.npy")
    if os.path.exists(tms_path):
        # timestamp files ship in us (events_tms_files_unit=us in every
        # published config), matching the loader's internal unit
        all_t = np.load(tms_path).astype(np.float64)
        events = events[(events[:, 1] >= all_t.min())
                        & (events[:, 1] <= all_t.max())]
    print(f"loaded {events.shape[0]} events (pose-range filtered), "
          f"{id_to_coords.shape[0] if id_to_coords.ndim == 2 else h * w} "
          f"coordinate ids")

    succ, num_succ, latest, first = compute_successor(events[:, 0])
    out = os.path.join(args.scene_dir, "events_successor.npz")
    np.savez_compressed(out, successor_idx=succ, num_successors=num_succ,
                        latest_seen=latest, first_seen=first,
                        n_events=events.shape[0])
    print(f"wrote {out}")

    if args.accumulate > 0:
        acc = accumulate_events(events, args.accumulate)
        np.save(os.path.join(args.scene_dir,
                             f"events_accum_{args.accumulate}.npy"), acc)
        print(f"wrote count-accumulation ({acc.shape[0]} rows)")
    if args.accumulate_at_time > 0:
        tms = np.load(os.path.join(args.scene_dir, "all_timestamps.npy"))
        acc, zero = accumulate_events_at_time(
            events, np.sort(tms.astype(np.float64)),
            args.accumulate_at_time, return_zeroevents=True)
        np.savez(os.path.join(
            args.scene_dir,
            f"events_accum_t{args.accumulate_at_time}.npz"),
            events=acc, zero_events=zero)
        print(f"wrote time-grid accumulation ({acc.shape[0]} rows)")


if __name__ == "__main__":
    main()
