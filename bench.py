#!/usr/bin/env python
"""Benchmark: full-training-step throughput at the paper workload scale.

Workload per iteration (BASELINE.md): image branch N_rand=1024 rays x
kernel_ptnum=10 RBK-expanded rays, event branch 2 x 4096 rays, each ray
64 coarse + 128 merged fine samples through the PDRF tri-plane fields
(coarse 16.7M / fine 134M voxels, app_n_comp=[64,16,16]), full loss ladder
(EGM + CRF + TV + AWP) and the Adam update — one jitted XLA program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference repo publishes no numbers (BASELINE.json
.published is empty), so the denominator is a documented estimate of the
PyTorch reference on A100: ~2.0 it/s at 18,432 rays/iter = 36,864 rays/s
(Deblur-NeRF-family trainers at this exact per-iter ray/sample budget run
1.5-2.5 it/s on A100-class GPUs). The BASELINE.json north-star of >=5x
A100 therefore corresponds to vs_baseline >= 5.0.

``run()`` is importable with overrides (batch size, grad_accum, flag
toggles, steps in flight) — tools/sweep_batch.py uses it for the
headroom sweeps recorded in PERF_NOTES.md.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 36_864.0

# Speed-of-light for THIS step (pure HBM bytes + MXU FLOPs, PERF_NOTES.md
# round 1) per chip generation. The north-star in BASELINE.json names v5p;
# every measurement in this environment is v5e ("TPU v5 lite") — the payload
# carries the chip so the two are never conflated.
ROOFLINE_RAYS_PER_SEC = {
    "TPU v5 lite": 380_000.0,
}

N_RAND = 1024
PTNUM = 10
EVENTS_N_RAND = 4096


def run(n_rand=N_RAND, events_n_rand=EVENTS_N_RAND, grad_accum=2,
        steps_in_flight=2, iters=10, arg_overrides=None, debug=False,
        fine_cull_capacity=0.0, coarse_cull_capacity=0.0, on_train=None):
    """Build the paper-scale step and time it; returns a result dict."""
    import jax

    from evdeblurnerf_tpu.utils import compile_cache

    # persistent compile cache: ~4.5 min of bench wall time is compile;
    # repeat runs (A/B pairs, sweeps) hit the cache. EVDN_DISABLE_COMPILE_CACHE=1
    # restores cold-compile measurements.
    compile_cache.enable()

    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.models.renderer import RenderConfig
    from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                                kernel_config_from_args)
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state
    from evdeblurnerf_tpu.train.step import (build_train_step,
                                             compute_schedule_weights)
    from evdeblurnerf_tpu.utils.misc import annealing_interpolator

    rays_per_iter = n_rand * PTNUM + 2 * events_n_rand

    H, W, focal = 480, 640, 500.0
    args = default_args(
        N_rand=n_rand, events_N_rand=events_n_rand,
        N_samples=64, N_importance=64, mode="c2f",
        kernel_type="RBK", kernel_ptnum=PTNUM, kernel_rbk_use_origin=True,
        kernel_use_awp=True, kernel_img_embed=32,
        kernel_rbk_extra_feat_ch=0, kernel_start_iter=0,
        use_viewdirs=True, use_events=True, add_event_egm=True,
        add_event_egm_stages=["stage0", "stage1"],
        tone_mapping_events_type="learn",
        tone_mapping_events_add_bii="pos-neg",
        lrate=5e-3, lrate_decay=10, seed=0,
        remat=False, grad_accum=grad_accum,
        **(arg_overrides or {}),
    )
    from evdeblurnerf_tpu.config import resolve_event_thresholds

    resolve_event_thresholds(args)

    cfg = RenderConfig(
        mode="c2f", N_samples=64, N_importance=64, use_viewdirs=True,
        multires=10, multires_views=4, ndc=True, near=0.0, far=1.0,
        H=H, W=W, focal=focal,
        aabb=((-1.6, -1.7, -1.0), (1.7, 1.6, 1.0)),
        coarse_n_voxels=16777248, fine_n_voxels=134217984,
        coarse_app_n_comp=(64, 16, 16), fine_app_n_comp=(64, 16, 16),
        coarse_hidden_dim=64, coarse_hidden_dim_color=64,
        fine_hidden_dim=256, fine_hidden_dim_color=256,
        fine_geo_feat_dim=128, coarse_app_dim=32, fine_app_dim=32,
        kernel_feat_cnl=15, kernel_type="RBK", use_awp=True,
        triplane_bf16=args.triplane_bf16,
        triplane_line_matmul=args.triplane_line_matmul,
        fine_cull_capacity=fine_cull_capacity,
        coarse_cull_capacity=coarse_cull_capacity)
    kcfg = kernel_config_from_args(args)
    K = ((focal, 0.0, W / 2), (0.0, focal, H / 2), (0.0, 0.0, 1.0))
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=30, K=K)
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                               extra_features_event=2)

    rng = np.random.default_rng(0)

    def make_rays(n, seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(n, 3)).astype(np.float32) * 0.05
        d = r.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
        return np.stack([o, d], axis=-1)

    batch = {
        "rays": make_rays(n_rand, 0),
        "rays_x": rng.uniform(0, W, n_rand).astype(np.float32),
        "rays_y": rng.uniform(0, H, n_rand).astype(np.float32),
        "images_idx": rng.integers(0, 30, n_rand).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (n_rand, 3, 4)).astype(np.float32),
        "rgbsf": rng.uniform(0, 1, (n_rand, 3)).astype(np.float32),
    }
    ev_batch = {
        "events_rays_start": make_rays(events_n_rand, 1),
        "events_rays_end": make_rays(events_n_rand, 2),
        "events_pos_pol_cumsum":
            rng.integers(0, 3, events_n_rand).astype(np.float32),
        "events_neg_pol_cumsum":
            -rng.integers(0, 3, events_n_rand).astype(np.float32),
    }

    key = jax.random.PRNGKey(0)
    tx = build_optimizer(args.lrate, args.lrate_decay)
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)
    batch = jax.device_put(batch)
    ev_batch = jax.device_put(ev_batch)

    step_fn = build_train_step(model, crf, tx, args)
    sw = compute_schedule_weights(
        args, 0, kernel_end_warmup_iter=-1, w_kernel=lambda s: 1.0,
        w_pts0_target=lambda s: 0.0,
        w_events_egm=annealing_interpolator(1.0, 1.0, None, "constant"),
        fine_loss_weight=0.1, events_active=True)

    occ_grid = None
    if coarse_cull_capacity > 0:
        # throughput is content-INDEPENDENT (the culled coarse width is the
        # fixed capacity*N_samples lane budget regardless of how many
        # voxels are occupied), so the grid from the random-init params is
        # as representative as a trained one; refresh cost is excluded from
        # the step timing exactly as in production (1 refresh per 256 steps)
        from evdeblurnerf_tpu.models.system import build_occ_grid

        occ_grid = jax.jit(
            lambda v: build_occ_grid(model, v))(
                {"params": state.params["nerf"]})

    def one(state):
        return step_fn(state, batch, ev_batch, key, sw,
                       force_naive=False, events_active=True,
                       fine_cull=fine_cull_capacity > 0,
                       coarse_cull=coarse_cull_capacity > 0,
                       occ_grid=occ_grid)

    # warmup/compile; sync via host transfer — block_until_ready does not
    # actually block on remote backends, which would leak compile time into
    # the timed window
    for _ in range(3):
        state, aux = one(state)
        float(aux["loss"])

    if debug:
        for it in range(5):
            t0 = time.perf_counter()
            state, aux = one(state)
            loss = float(aux["loss"])        # blocks
            print(f"step {it}: {time.perf_counter() - t0:.4f}s "
                  f"loss={loss:.5f}", flush=True)

    # host sync every `steps_in_flight` steps: block_until_ready does NOT
    # synchronize on remote backends; the default of 2 in flight mirrors
    # (conservatively) the production loop, which syncs only at the
    # i_print/i_tensorboard cadence (>=100 steps) — a sync per step would
    # charge the tunnel RTT to every step, which no real run pays
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        state, aux = one(state)
        pending.append(aux["loss"])
        if len(pending) >= steps_in_flight:
            float(pending.pop(0))
    for p in pending:
        float(p)
    dt = (time.perf_counter() - t0) / iters

    rays_per_sec = rays_per_iter / dt
    if on_train is not None:
        # flush the headline number the moment it exists — a deadline kill
        # during the eval measurement must not lose the train throughput
        # (round-4 BENCH_r04.json postmortem)
        on_train(rays_per_sec)

    # eval-render throughput: the test/video rendering path (chunked
    # no-kernel render, ref protocol run_nerf.py:642-709), measured the way
    # train/evaluate.py::render_poses actually runs it — chunks streamed
    # with bounded in-flight dispatch, not a host sync per chunk
    from evdeblurnerf_tpu.train.evaluate import build_chunk_renderer

    chunk_fn = build_chunk_renderer(model)
    # 32768 is the measured-optimal chunk on v5e: big enough to amortize the
    # ~13 ms/program fixed cost AND (unlike 16384) XLA keeps the coarse
    # tables VMEM-promoted (the 16k schedule spills them, +11 ms/chunk);
    # 65536 is flat (138.4k vs 137.2k rays/s) with more HBM pressure
    eval_chunk = 32768
    eval_rays = jax.device_put(make_rays(eval_chunk, 3))
    variables = {"params": state.params["nerf"]}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    rgb, _, _ = chunk_fn(variables, eval_rays)   # compile
    np.asarray(rgb)
    eval_iters = 2 * iters
    t0 = time.perf_counter()
    pending = []
    for _ in range(eval_iters):
        rgb, depth, _ = chunk_fn(variables, eval_rays)
        pending.append((rgb, depth))
        if len(pending) > 4:
            r, d = pending.pop(0)
            np.asarray(r), np.asarray(d)
    for r, d in pending:
        np.asarray(r), np.asarray(d)
    eval_dt = (time.perf_counter() - t0) / eval_iters
    eval_rays_per_sec = eval_chunk / eval_dt

    return {
        "rays_per_iter": rays_per_iter,
        "step_seconds": dt,
        "rays_per_sec": rays_per_sec,
        "eval_rays_per_sec": eval_rays_per_sec,
    }


def _wait_for_backend():
    """Block until a JAX backend actually answers, with a bounded deadline.

    On a sick remote-TPU tunnel ``jax.devices()`` hangs indefinitely (it
    has no client-side timeout), which would wedge the whole bench run.
    Probe the backend in a subprocess with a per-attempt timeout and retry
    until ``BENCH_BACKEND_DEADLINE_S`` (default 30 min) elapses; exit
    non-zero with a diagnostic instead of hanging or printing a number
    that was never measured.
    """
    import subprocess
    import sys

    deadline = float(os.environ.get("BENCH_BACKEND_DEADLINE_S", 1800))
    attempt_timeout = float(os.environ.get("BENCH_BACKEND_PROBE_S", 150))
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=attempt_timeout)
            if proc.returncode == 0 and proc.stdout.strip():
                plat = proc.stdout.strip().splitlines()[-1]
                print(f"[bench] backend up: {plat} "
                      f"(attempt {attempt})", file=sys.stderr)
                return
            err = proc.stderr.strip()[-500:]
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {attempt_timeout:.0f}s"
        elapsed = time.monotonic() - t0
        if elapsed > deadline:
            print(f"[bench] no backend after {elapsed:.0f}s "
                  f"({attempt} probes); last error: {err}", file=sys.stderr)
            _emit_stale_or_die(f"no backend after {elapsed:.0f}s: {err}")
        print(f"[bench] backend probe {attempt} failed ({err}); "
              f"retrying ({elapsed:.0f}/{deadline:.0f}s)", file=sys.stderr)
        time.sleep(min(60, attempt_timeout / 2))


def _default_cull() -> tuple:
    """The bench measures the flags' PRODUCTION defaults so the official
    payload always reflects what a default run trains with."""
    from evdeblurnerf_tpu.config import default_args

    a = default_args()
    return (float(a.fine_cull_capacity),
            float(getattr(a, "coarse_cull_capacity", 0.0) or 0.0))


_LAST_BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "LAST_BENCH.json")


def _emit_stale_or_die(reason: str):
    """No fresh measurement obtainable (backend unreachable, or deadline
    exceeded before the train number landed): print the LAST real-TPU
    measurement, clearly labeled stale, rather than nothing — or exit 3 if
    none was ever recorded. Never fabricates: the payload is a verbatim
    prior measurement plus ``stale: true`` + the failure reason."""
    try:
        with open(_LAST_BENCH) as f:
            payload = json.load(f)
    except Exception:
        raise SystemExit(3)
    payload["stale"] = True
    payload["stale_reason"] = f"NOT re-measured this run: {reason}"
    print(json.dumps(payload), flush=True)
    raise SystemExit(0)


def _build_payload(rays_per_sec, eval_rays_per_sec, chip,
                   fine_cull_capacity, coarse_cull_capacity=0.0):
    roofline = ROOFLINE_RAYS_PER_SEC.get(chip)
    return {
        "metric": "train_rays_per_sec_full_step",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
        # the reference publishes no numbers; the denominator is a
        # documented estimate (see module docstring), not a measurement
        "baseline_kind": "estimate",
        "eval_rays_per_sec": (round(eval_rays_per_sec, 1)
                              if eval_rays_per_sec else None),
        # measurement context: single chip of `chip`; the BASELINE.json
        # north star names v5p, which this payload does NOT measure
        "chip": chip,
        "n_chips_measured": 1,
        # steady-state approximation knobs active in this measurement
        # (quality-gated in PERF_NOTES rounds 4-5; 0.0 = reference-exact
        # sampling)
        "fine_cull_capacity": fine_cull_capacity,
        "coarse_cull_capacity": coarse_cull_capacity,
        # the production loop engages the coarse cull per-refresh via the
        # budget-sufficiency gate (train/loop.py, PERF_NOTES round 5); the
        # bench measures the ENGAGED program — i.e. steady-state throughput
        # on scenes sparse enough for the gate, and an upper bound on dense
        # scenes where the gate falls back to full coarse sampling
        "coarse_cull_gated": bool(coarse_cull_capacity > 0),
        "roofline_rays_per_sec": roofline,
        "roofline_fraction": (round(rays_per_sec / roofline, 3)
                              if roofline else None),
        # 8-chip DP extrapolation (rays are embarrassingly parallel, tables
        # replicated; the sharded step passes numeric-equivalence tests) —
        # a PROJECTION, no multi-chip hardware exists in this environment
        "projected_8chip_dp_rays_per_sec": round(8 * rays_per_sec, 1),
        "projected_8chip_vs_baseline": round(
            8 * rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
        "projection_kind": "projected_unmeasured",
    }


def _write_json(path, payload):
    try:
        with open(path, "w") as f:
            json.dump(payload, f)
            f.write("\n")
    except OSError:
        pass


def _worker(progress_path, fine_cull_capacity, coarse_cull_capacity):
    """Measure and WRITE results to ``progress_path`` as they land — the
    train payload the moment the train measurement finishes, the full
    payload after eval. Prints nothing to stdout; the parent owns the one
    official JSON line."""
    _wait_for_backend()
    import jax

    chip = jax.devices()[0].device_kind
    stamp = {"measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())}

    def on_train(rays_per_sec):
        payload = _build_payload(rays_per_sec, None, chip,
                                 fine_cull_capacity, coarse_cull_capacity)
        payload["eval_not_measured"] = ("deadline hit before the eval "
                                        "measurement completed")
        _write_json(progress_path, {**payload, **stamp})

    res = run(debug=bool(os.environ.get("BENCH_DEBUG")),
              fine_cull_capacity=fine_cull_capacity,
              coarse_cull_capacity=coarse_cull_capacity, on_train=on_train)
    payload = _build_payload(res["rays_per_sec"], res["eval_rays_per_sec"],
                             chip, fine_cull_capacity, coarse_cull_capacity)
    _write_json(progress_path, {**payload, **stamp})
    _write_json(_LAST_BENCH, {**payload, **stamp})


def main():
    """Parent/watchdog: runs the measurement in a child process and prints
    exactly ONE JSON line in every outcome. A Python-level SIGALRM cannot
    interrupt a long XLA compile (the handler only runs between bytecodes),
    so the deadline lives in a plain-Python parent that can always act:
    on child success it prints the full payload; if ``BENCH_BUDGET_S``
    (default 560 s — under the driver's observed kill deadline) expires it
    kills the child and prints the train-only payload if the train
    measurement landed, else the labeled-stale prior measurement.
    (Round-4 postmortem: BENCH_r04.json rc=124, parsed=null.)"""
    import argparse
    import signal
    import subprocess
    import sys
    import tempfile

    ap = argparse.ArgumentParser()
    # measurement knobs for the culled-pass A/Bs (PERF_NOTES rounds 4-5);
    # the OFFICIAL payload keeps the flags' production defaults
    fine_default, coarse_default = _default_cull()
    ap.add_argument("--fine_cull_capacity", type=float,
                    default=fine_default)
    ap.add_argument("--coarse_cull_capacity", type=float,
                    default=coarse_default)
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    cli = ap.parse_args()

    if cli._worker:
        _worker(cli._worker, cli.fine_cull_capacity,
                cli.coarse_cull_capacity)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", 560))
    progress_path = tempfile.mktemp(prefix="bench_progress_",
                                    suffix=".json")
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--_worker", progress_path,
         "--fine_cull_capacity", str(cli.fine_cull_capacity),
         "--coarse_cull_capacity", str(cli.coarse_cull_capacity)],
        stdout=sys.stderr, stderr=sys.stderr)
    try:
        rc = child.wait(timeout=budget)
    except subprocess.TimeoutExpired:
        child.send_signal(signal.SIGKILL)
        child.wait()
        rc = None

    payload = None
    try:
        with open(progress_path) as f:
            payload = json.load(f)
        os.unlink(progress_path)
    except Exception:
        pass

    if payload is None:
        reason = (f"deadline ({budget:.0f}s) before the train measurement "
                  f"completed" if rc is None else
                  f"worker exited rc={rc} with no measurement")
        _emit_stale_or_die(reason)
    if rc is None:
        payload["deadline_exceeded"] = True
    payload.pop("measured_utc", None)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
