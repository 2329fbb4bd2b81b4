"""Whole-forward golden parity fixtures.

Serialized tiny fixed-weight models (every kernel type: RBK+AWP, DSK, PBE
— PBE exercises the CRR composite-then-color coarse stage + stage-0 coarse
render; RBK/DSK the FVR fine path) with recorded `train_forward` and eval
`render` outputs. Future refactors of the sampling/field/compositing path
(packed gathers, Pallas kernels, ...) must reproduce these to float32
noise — the guardrail that lets perf work proceed without silently
drifting numerics.

Reference formulas live at /root/reference/networks/renderer.py:129-264
(render_rays) and networks/pdrf/blurmodel.py:109-224 (kernel expansion).

Regenerate (after an *intentional* numerics change) with:
    python tests/test_golden_forward.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.models.renderer import RenderConfig, Renderer
from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                            kernel_config_from_args)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
N = 16
K = ((60.0, 0.0, 40.0), (0.0, 60.0, 32.0), (0.0, 0.0, 1.0))

VARIANTS = {
    # kernel_type -> extra default_args overrides
    "rbk_awp": dict(kernel_type="RBK", kernel_ptnum=3,
                    kernel_rbk_use_origin=True, kernel_use_awp=True,
                    kernel_awp_sam_emb_width=8, kernel_awp_mot_emb_width=8),
    "dsk": dict(kernel_type="DSK", kernel_ptnum=3),
    "pbe": dict(kernel_type="PBE", kernel_ptnum=3),
}


def _make_args(overrides):
    args = default_args(
        N_rand=N, N_samples=4, N_importance=4, chunk=512, mode="c2f",
        kernel_img_embed=8, kernel_rbk_extra_feat_ch=0,
        kernel_start_iter=0, use_viewdirs=True, multires=4,
        multires_views=2, lrate=5e-3, lrate_decay=10, seed=0, perturb=1.0,
        **overrides)
    return args


def _make_cfg(kernel_type, use_awp):
    return RenderConfig(
        mode="c2f", N_samples=4, N_importance=4, use_viewdirs=True,
        multires=4, multires_views=2, ndc=True, near=0.0, far=1.0,
        H=64, W=80, focal=60.0, perturb=1.0,
        aabb=((-1.6, -1.6, -1.0), (1.6, 1.6, 1.0)),
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=8, fine_app_dim=8,
        kernel_feat_cnl=15, kernel_type=kernel_type, use_awp=use_awp)


def _build_model(name):
    overrides = VARIANTS[name]
    args = _make_args(overrides)
    cfg = _make_cfg(overrides["kernel_type"],
                    overrides.get("kernel_use_awp", False))
    kcfg = kernel_config_from_args(args)
    return EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=4, K=K)


def _make_inputs():
    rng = np.random.default_rng(7)
    rays_o = rng.normal(size=(N, 3)).astype(np.float32) * 0.05
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = np.stack([rays_o, rays_d], axis=-1)
    rays_info = {
        "rays_x": rng.uniform(0, 80, N).astype(np.float32),
        "rays_y": rng.uniform(0, 64, N).astype(np.float32),
        "images_idx": rng.integers(0, 4, N).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N, 3, 4)).astype(np.float32),
    }
    return rays, rays_info


def _flatten(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


def _restore_like(template, flat):
    leaves_p = jax.tree_util.tree_leaves_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    leaves = [jnp.asarray(flat[jax.tree_util.keystr(p)])
              for p, _ in leaves_p]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _run_variant(name, variables):
    """Deterministic forward pass bundle for one variant; returns a flat
    name->array dict of everything worth pinning."""
    model = _build_model(name)
    rays, rays_info = _make_inputs()
    key = jax.random.PRNGKey(42)

    mutable = ["batch_stats"] if "batch_stats" in variables else False
    out = model.apply(variables, key, rays, rays_info, force_naive=False,
                      return_pts0_rgb=True, mutable=mutable)
    if mutable:
        out, _ = out
    rgb, rgb1, other_loss, other_tensors = out

    rec = {"rgb": rgb}
    if rgb1 is not None:
        rec["rgb1"] = rgb1
    for k, v in other_loss.items():
        rec[f"loss/{k}"] = v
    for k, v in other_tensors.items():
        if v is not None:
            rec[f"tensor/{k}"] = v

    # eval render path (render_rays with is_train=False, no perturb)
    ret = model.apply(variables, jax.random.PRNGKey(3), rays,
                      is_train=False, perturb=0.0,
                      method=lambda m, k, r, **kw: m.renderer.render(
                          k, r, **kw))
    rec["eval/rgb_map"] = ret["rgb_map"]
    rec["eval/depth_map"] = ret["depth_map"]
    if "rgb0" in ret and ret["rgb0"] is not None:
        rec["eval/rgb0"] = ret["rgb0"]
    return {k: np.asarray(v) for k, v in rec.items()}


def _init_variant(name):
    model = _build_model(name)
    rays, rays_info = _make_inputs()
    variables = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                           rays, rays_info, force_naive=False,
                           return_pts0_rgb=True)
    return dict(variables)


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"forward_{name}.npz")


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in VARIANTS:
        variables = _init_variant(name)
        rec = _run_variant(name, variables)
        payload = {f"var/{k}": v for k, v in _flatten(variables).items()}
        payload.update({f"out/{k}": v for k, v in rec.items()})
        np.savez(_golden_path(name), **payload)
        print(f"wrote {_golden_path(name)}: "
              f"{sum(v.size for v in payload.values())} values")


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_forward_matches_golden(name):
    path = _golden_path(name)
    assert os.path.exists(path), \
        "golden fixtures missing; run python tests/test_golden_forward.py --regen"
    data = np.load(path)
    flat_vars = {k[len("var/"):]: data[k] for k in data.files
                 if k.startswith("var/")}
    golden = {k[len("out/"):]: data[k] for k in data.files
              if k.startswith("out/")}

    template = _init_variant(name)
    variables = _restore_like(template, flat_vars)
    rec = _run_variant(name, variables)

    assert set(rec) == set(golden), (sorted(rec), sorted(golden))
    for k in sorted(golden):
        np.testing.assert_allclose(
            rec[k], golden[k], rtol=1e-5, atol=1e-6,
            err_msg=f"{name}: forward output {k} drifted from golden")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(__file__))
        regen()
    else:
        print(__doc__)
