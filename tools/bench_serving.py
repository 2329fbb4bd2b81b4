#!/usr/bin/env python
"""Serving latency/throughput benchmark for exported render artifacts.

The reference has no serving benchmark (its inference story is render-only
mode over a live model, ref: run_nerf.py:337-414). For the AOT artifacts
(`evdeblurnerf_tpu/serving.py`) the two production numbers are:

- **latency**: wall time of one synchronous chunk render (dispatch ->
  result on host), reported as p50/p90/p99 over ``--calls`` calls — the
  number an online service quotes;
- **throughput**: rays/s with ``--in_flight`` chunks dispatched ahead of
  the host sync (the offline/video-render regime, same pipeline discipline
  as `train/evaluate.py`).

Also reported: artifact load time and first-call time (deserialize + jit
of the exported module — the cold-start cost a replica pays once).

Prints ONE JSON line. Usage::

    python tools/export_renderer.py --config ... --out scene.evdnsrv
    python tools/bench_serving.py --artifact scene.evdnsrv
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _make_rays(n: int, seed: int = 0) -> np.ndarray:
    r = np.random.default_rng(seed)
    o = r.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = r.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    return np.stack([o, d], axis=-1)


def run(artifact: str, calls: int = 30, in_flight: int = 4,
        warmup: int = 3) -> dict:
    """Measure one artifact; returns the result dict (importable for
    tests/sweeps, like bench.run)."""
    from evdeblurnerf_tpu import serving

    t0 = time.perf_counter()
    r = serving.load_renderer(artifact)
    load_s = time.perf_counter() - t0

    rays = _make_rays(r.chunk)
    t0 = time.perf_counter()
    np.asarray(r(rays)[0])
    first_call_s = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        np.asarray(r(rays)[0])

    # latency: synchronous call, result on host (what a request pays)
    lat = []
    for _ in range(calls):
        t0 = time.perf_counter()
        rgb, depth, _ = r(rays)
        np.asarray(rgb), np.asarray(depth)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)

    # throughput: bounded in-flight dispatch (offline render regime)
    t0 = time.perf_counter()
    pending = []
    for _ in range(calls):
        rgb, depth, _ = r(rays)
        pending.append((rgb, depth))
        # keep at most `in_flight` calls outstanding (0 = fully synchronous)
        while len(pending) > max(in_flight, 0):
            a, b = pending.pop(0)
            np.asarray(a), np.asarray(b)
    for a, b in pending:
        np.asarray(a), np.asarray(b)
    thr_dt = (time.perf_counter() - t0) / calls

    return {
        "artifact": artifact,
        "chunk": r.chunk,
        "nr_devices": r.nr_devices,
        "load_s": round(load_s, 4),
        "first_call_s": round(first_call_s, 4),
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
        "latency_p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 3),
        "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 3),
        "throughput_rays_per_sec": round(r.chunk / thr_dt, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--in_flight", type=int, default=4)
    args = ap.parse_args()
    print(json.dumps(run(args.artifact, calls=args.calls,
                         in_flight=args.in_flight)))


if __name__ == "__main__":
    main()
