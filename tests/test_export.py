"""Serving artifacts (`evdeblurnerf_tpu/serving.py`): AOT-exported render
programs with baked weights, reloadable without model code.

The reference's inference story is render-only mode over a live model +
checkpoint (ref: run_nerf.py:337-414); the serving path must reproduce the
live eval renderer exactly through a serialize/deserialize round-trip.
"""

import json
import os

import numpy as np
import pytest

from test_golden_forward import _build_model, _make_inputs

CHUNK = 16


def _init_variables(model):
    import jax

    rays, rays_info = _make_inputs()
    variables = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                           rays, rays_info)
    return variables


@pytest.mark.fast
def test_export_roundtrip_matches_live(tmp_path):
    import jax

    from evdeblurnerf_tpu import serving
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform

    model = _build_model("dsk")
    variables = _init_variables(model)
    crf = TonemappingTransform(map_type_rgb="gamma", map_type_event="none",
                               gamma=2.2)
    crf_params = crf.init(jax.random.PRNGKey(2),
                          np.zeros((4, 3), np.float32),
                          mode="encode_rgb").get("params", {})

    rays, _ = _make_inputs()
    rays = rays[:CHUNK]

    live = serving.make_render_fn(model, variables, crf=crf,
                                  crf_params=crf_params)(rays)

    exported, meta = serving.export_renderer(
        model, variables, chunk=CHUNK, crf=crf, crf_params=crf_params,
        meta={"H": 64, "W": 80, "K": [[60.0, 0, 40], [0, 60.0, 32],
                                      [0, 0, 1]]})
    path = str(tmp_path / "scene.evdnsrv")
    serving.save_renderer(path, exported, meta)

    r = serving.load_renderer(path)
    assert r.chunk == CHUNK
    assert r.meta["crf_folded"] and r.meta["H"] == 64
    got = r(rays)
    for name, a, b in zip(("rgb", "depth", "acc"), live, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
    # the CRF actually changed the rgb (non-identity fold)
    plain = serving.make_render_fn(model, variables)(rays)
    assert float(np.abs(np.asarray(plain[0]) - np.asarray(live[0])).max()) \
        > 1e-3


@pytest.mark.fast
def test_artifact_validation(tmp_path):
    from evdeblurnerf_tpu import serving

    model = _build_model("dsk")
    variables = _init_variables(model)
    exported, meta = serving.export_renderer(model, variables, chunk=CHUNK)
    path = str(tmp_path / "a.evdnsrv")
    serving.save_renderer(path, exported, meta)
    r = serving.load_renderer(path)

    with pytest.raises(ValueError, match="fixed chunks"):
        r(np.zeros((CHUNK + 1, 3, 2), np.float32))

    bad = str(tmp_path / "bad.evdnsrv")
    with open(bad, "wb") as f:
        f.write(b"NOTANART" + b"\x00" * 32)
    with pytest.raises(ValueError, match="bad magic"):
        serving.load_renderer(bad)

    import json
    import struct

    newer = str(tmp_path / "new.evdnsrv")
    head = json.dumps({"format_version": 999, "chunk": CHUNK}).encode()
    with open(newer, "wb") as f:
        f.write(b"EVDNSRV1" + struct.pack("<Q", len(head)) + head)
    with pytest.raises(ValueError, match="newer"):
        serving.load_renderer(newer)


@pytest.mark.fast
def test_render_poses_via_artifact(tmp_path):
    """Pose-level rendering from the artifact reproduces the live
    pipelined renderer (train/evaluate.py) on a whole tiny image."""
    from evdeblurnerf_tpu import serving
    from evdeblurnerf_tpu.train.evaluate import (build_chunk_renderer,
                                                 render_poses)

    H, W = 8, 10
    K = [[12.0, 0.0, 5.0], [0.0, 12.0, 4.0], [0.0, 0.0, 1.0]]
    model = _build_model("dsk")
    variables = _init_variables(model)
    pose = np.concatenate([np.eye(3), np.array([[0.02], [0.01], [0.03]])],
                          axis=1).astype(np.float32)[None]

    live_rgb, live_depth = render_poses(
        variables, build_chunk_renderer(model), pose, H, W,
        np.asarray(K), chunk=CHUNK)

    exported, meta = serving.export_renderer(
        model, variables, chunk=CHUNK, meta={"H": H, "W": W, "K": K})
    path = str(tmp_path / "p.evdnsrv")
    serving.save_renderer(path, exported, meta)
    r = serving.load_renderer(path)
    got_rgb, got_depth = r.render_poses(pose)

    np.testing.assert_allclose(got_rgb, live_rgb, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_depth, live_depth, rtol=1e-6, atol=1e-6)


@pytest.mark.fast
def test_sharded_export_matches_single_device(tmp_path):
    """A data-parallel artifact (rays sharded over an 8-device mesh,
    weights replicated as constants) reproduces the single-device one."""
    import jax

    from evdeblurnerf_tpu import serving
    from evdeblurnerf_tpu.parallel import create_mesh

    model = _build_model("dsk")
    variables = _init_variables(model)
    rays, _ = _make_inputs()
    rays = rays[:CHUNK]

    single, _ = serving.export_renderer(model, variables, chunk=CHUNK)
    want = [np.asarray(v) for v in single.call(rays)]

    mesh = create_mesh(jax.devices()[:8])
    exported, meta = serving.export_renderer(model, variables, chunk=CHUNK,
                                             mesh=mesh)
    assert meta["nr_devices"] == 8
    path = str(tmp_path / "dp.evdnsrv")
    serving.save_renderer(path, exported, meta)
    r = serving.load_renderer(path)
    assert r.nr_devices == 8
    got = r(rays)
    for name, a, b in zip(("rgb", "depth", "acc"), want, got):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5, atol=1e-6,
                                   err_msg=name)

    with pytest.raises(ValueError, match="must divide"):
        serving.export_renderer(model, variables, chunk=CHUNK + 1, mesh=mesh)


@pytest.mark.slow
def test_export_experiment_end_to_end(tmp_path):
    """Train a short run on the synthetic scene, export via
    `export_experiment` (the CLI tool's core), reload, and check the
    artifact's test-pose render against the live checkpointed model."""
    import jax

    from synthetic import make_synthetic_scene
    from test_train import tiny_args

    from evdeblurnerf_tpu import serving
    from evdeblurnerf_tpu.train.evaluate import (apply_crf_host,
                                                 build_chunk_renderer,
                                                 render_poses)
    from evdeblurnerf_tpu.train.loop import train

    scene_dir = str(tmp_path / "scene")
    os.makedirs(scene_dir)
    make_synthetic_scene(scene_dir)
    logdir = str(tmp_path / "logs")
    # colornet_weightdecay changes the opt_state tree structure
    # (optax.add_decayed_weights prepended): the export's restore template
    # must match it, which regressed once — keep it in this path
    args = tiny_args(scene_dir, logdir, N_iters=30, i_weights=30,
                     i_testset=10 ** 9, colornet_weightdecay=1e-4)
    state = train(args)

    out = str(tmp_path / "exp.evdnsrv")
    meta = serving.export_experiment(args, out, chunk=64)
    assert meta["step"] == 30 and meta["expname"] == "smoke"

    from evdeblurnerf_tpu.train.loop import build_datasets, build_model

    llff, _ = build_datasets(args)
    _, _, model, crf = build_model(args, llff)

    r = serving.load_renderer(out)
    pose = np.asarray(llff.test_poses)[:1, :3, :4]
    got_rgb, _ = r.render_poses(pose)
    assert got_rgb.shape == (1, meta["H"], meta["W"], 3)
    assert np.isfinite(got_rgb).all()

    # live twin: same checkpointed weights through the live eval path + CRF
    variables = {"params": jax.device_get(state.params["nerf"])}
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    live_rgb, _ = render_poses(variables, build_chunk_renderer(model),
                               pose, llff.h, llff.w, np.asarray(llff.K),
                               chunk=64)
    live_rgb = apply_crf_host(crf, jax.device_get(state.params["crf"]),
                              live_rgb, skip_learn_crf=False)
    np.testing.assert_allclose(got_rgb, live_rgb, rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_bench_serving_tool(tmp_path):
    """tools/bench_serving.py measures a tiny artifact end-to-end and
    reports sane latency/throughput numbers."""
    import sys

    import jax

    from evdeblurnerf_tpu import serving

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import bench_serving

    model = _build_model("dsk")
    variables = _init_variables(model)
    exported, meta = serving.export_renderer(
        model, variables, chunk=CHUNK,
        meta={"H": 64, "W": 80, "K": [[60.0, 0, 40], [0, 60.0, 32],
                                      [0, 0, 1]]})
    path = str(tmp_path / "scene.evdnsrv")
    serving.save_renderer(path, exported, meta)

    res = bench_serving.run(path, calls=5, in_flight=2, warmup=1)
    assert res["chunk"] == CHUNK and res["nr_devices"] == 1
    assert res["load_s"] > 0 and res["first_call_s"] > 0
    assert res["latency_p50_ms"] <= res["latency_p99_ms"]
    assert res["throughput_rays_per_sec"] > 0
    json.dumps(res)  # one-line JSON serializable
