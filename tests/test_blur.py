"""Blur-kernel (DSK/PBE/RBK), AWP and system-forward tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.models.renderer import RenderConfig
from evdeblurnerf_tpu.models.system import EvDeblurNeRF, KernelConfig

N_RAYS = 8
H, W = 16, 20
K_INTR = ((10.0, 0.0, 10.0), (0.0, 10.0, 8.0), (0.0, 0.0, 1.0))


def tiny_render_config(**kw):
    base = dict(
        mode="c2f", N_samples=8, N_importance=8, use_viewdirs=True,
        multires=4, multires_views=2, ndc=True, near=0.0, far=1.0,
        H=H, W=W, focal=10.0,
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=16, coarse_hidden_dim_color=16,
        fine_hidden_dim=16, fine_hidden_dim_color=16,
        fine_geo_feat_dim=16, coarse_app_dim=8, fine_app_dim=8,
        kernel_feat_cnl=15,
    )
    base.update(kw)
    return RenderConfig(**base)


def make_inputs(key):
    k1, k2 = jax.random.split(key)
    rays_o = jax.random.normal(k1, (N_RAYS, 3)) * 0.1
    rays_d = jax.random.normal(k2, (N_RAYS, 3))
    rays_d = rays_d.at[:, 2].set(-jnp.abs(rays_d[:, 2]) - 0.5)
    rays = jnp.stack([rays_o, rays_d], -1)
    poses = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.array([[0.], [0.], [4.]])], -1),
        (N_RAYS, 3, 4))
    rays_info = {
        "images_idx": jnp.arange(N_RAYS) % 3,
        "rays_x": jnp.linspace(0.5, W - 0.5, N_RAYS),
        "rays_y": jnp.linspace(0.5, H - 0.5, N_RAYS),
        "poses": poses,
    }
    return rays, rays_info


def build_and_run(kcfg, cfg=None, return_pts0=True):
    cfg = cfg or tiny_render_config(
        kernel_type=kcfg.kernel_type if kcfg.kernel_type != "RBK" else "RBK",
        use_awp=kcfg.use_awp)
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=3, K=K_INTR)
    key = jax.random.PRNGKey(0)
    rays, rays_info = make_inputs(key)
    force_naive = kcfg.kernel_type == "none"
    variables = model.init(key, key, rays, rays_info,
                           force_naive=force_naive,
                           return_pts0_rgb=return_pts0)
    out, _ = model.apply(
        variables, key, rays, rays_info,
        force_naive=force_naive, return_pts0_rgb=return_pts0,
        mutable=["batch_stats"])
    return out


@pytest.mark.parametrize("ktype", ["DSK", "RBK"])
@pytest.mark.slow
def test_kernel_forward_shapes(ktype):
    kcfg = KernelConfig(kernel_type=ktype, ptnum=4, feat_cnl=15)
    rgb, rgb1, other_loss, other_tensors = build_and_run(kcfg)
    assert rgb.shape == (N_RAYS, 3)
    assert rgb1.shape == (N_RAYS, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(rgb1)).all()
    assert "TV" in other_loss
    assert other_tensors["stage1_rgb_pts0"].shape == (N_RAYS, 3)
    if ktype == "DSK":
        assert "align" in other_loss


@pytest.mark.slow
def test_pbe_with_awp():
    kcfg = KernelConfig(kernel_type="PBE", ptnum=4, feat_cnl=15,
                        use_awp=True, awp_sam_emb_width=16,
                        awp_mot_emb_width=16)
    rgb, rgb1, other_loss, other_tensors = build_and_run(kcfg)
    assert rgb.shape == (N_RAYS, 3)
    assert "rgb_awp" in other_tensors
    assert other_tensors["rgb_awp"].shape == (N_RAYS, 3)
    assert np.isfinite(np.asarray(other_tensors["rgb_awp"])).all()
    assert other_tensors["stage0_rgb_pts0"].shape == (N_RAYS, 3)
    # align loss is PBE-disabled (point 0 pinned; ref: blurmodel.py:187-193)
    assert "align" not in other_loss


@pytest.mark.slow
def test_naive_forward():
    kcfg = KernelConfig(kernel_type="none")
    cfg = tiny_render_config(kernel_type="none")
    rgb, rgb1, other_loss, other_tensors = build_and_run(kcfg, cfg=cfg)
    assert rgb.shape == (N_RAYS, 3)
    assert other_tensors["stage1_rgb_pts0"].shape == (N_RAYS, 3)


def test_rbk_weight_normalized():
    from evdeblurnerf_tpu.models.blur_rbk import RigidBlurringModel

    model = RigidBlurringModel(view_embed_cnl=8, num_motion=3)
    key = jax.random.PRNGKey(1)
    rays = jax.random.normal(key, (5, 3, 2))
    emb = jax.random.normal(key, (5, 8))
    variables = model.init(key, rays, emb)
    new_rays, weight, align = model.apply(variables, rays, emb)
    assert new_rays.shape == (5, 4, 3, 2)
    assert weight.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(weight.sum(-1)), 1.0, atol=1e-5)
    # identity motion kept as point 0 (ref: dpnerf/blurmodel.py:59-61); the
    # warped motions start small-but-nonzero (tiny xavier weight gain, but
    # default torch bias init; ref: dpnerf/blurmodel.py:37-45)
    np.testing.assert_allclose(np.asarray(new_rays[:, 0]), np.asarray(rays),
                               atol=1e-6)
    assert float(jnp.abs(new_rays[:, 1] - rays).max()) < 0.5


def test_dsk_pbe_pins_point0():
    """PBE pins point 0 to the sharp ray: with zero translation the point-0
    ray must match the undeformed camera ray."""
    from evdeblurnerf_tpu.models.blur_dsk import DSKBlurModel

    model = DSKBlurModel(num_img=3, num_pt=4, kernel_hwindow=10,
                         kernel_type="PBE", img_embed_cnl=8,
                         random_hwindow=0.0)
    key = jax.random.PRNGKey(2)
    Km = jnp.asarray(K_INTR)
    rays_x = jnp.array([3.5, 7.5])
    rays_y = jnp.array([2.5, 9.5])
    idx = jnp.array([0, 1])
    poses = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1), (2, 3, 4))
    emb = jnp.zeros((2, 8))
    variables = model.init(key, key, Km, rays_x, rays_y, idx, poses, emb)
    new_rays, weight, align = model.apply(
        variables, key, Km, rays_x, rays_y, idx, poses, emb)
    assert align is None
    assert new_rays.shape == (2, 4, 3, 2)
    np.testing.assert_allclose(np.asarray(weight.sum(-1)), 1.0, atol=1e-5)
    # point 0 dir = ((x-cx)/fx, -(y-cy)/fy, -1) in camera frame
    expect_d = np.stack([(np.array([3.5, 7.5]) - 10.0) / 10.0,
                         -(np.array([2.5, 9.5]) - 8.0) / 10.0,
                         [-1.0, -1.0]], -1)
    np.testing.assert_allclose(np.asarray(new_rays[:, 0, :, 1]), expect_d,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_rays[:, 0, :, 0]), 0.0,
                               atol=1e-7)


@pytest.mark.fast
def test_rbk_warp_pose_consistent_with_ray_warp():
    """rbk_warp_pose (API-parity twin, uncalled upstream too) applies the
    same screw motion as rbk_warp: rays regenerated from a warped pose
    must equal the directly warped rays."""
    from evdeblurnerf_tpu.models.blur_rbk import RigidBlurringModel

    model = RigidBlurringModel(view_embed_cnl=8, num_motion=2, feat_ch=0,
                               use_origin=True)
    rng = np.random.default_rng(3)
    N = 5
    # random valid c2w poses
    poses = []
    for _ in range(N):
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
            [2*(x*y+w*z), 1 - 2*(x*x+z*z), 2*(y*z-w*x)],
            [2*(x*z-w*y), 2*(y*z+w*x), 1 - 2*(x*x+y*y)]])
        t = rng.normal(size=(3, 1))
        poses.append(np.concatenate([R, t], 1))
    poses = jnp.asarray(np.stack(poses).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32) * 0.1)
    dirs_cam = rng.normal(size=(N, 3)).astype(np.float32)

    rays_o = poses[:, :3, 3]
    rays_d = jnp.einsum("nij,nj->ni", poses[:, :3, :3],
                        jnp.asarray(dirs_cam))
    rays = jnp.stack([rays_o, rays_d], -1)

    m = model.bind(model.init(jax.random.PRNGKey(0),
                              jnp.stack([rays_o, rays_d], -1),
                              jnp.zeros((N, 8))))
    warped_rays = m.rbk_warp(rays, r, v)           # [N, num_pt, 3, 2]
    warped_poses = m.rbk_warp_pose(poses, r, v)    # [N, num_pt, 4, 4]

    o2 = warped_poses[:, :, :3, 3]
    d2 = jnp.einsum("npij,nj->npi", warped_poses[:, :, :3, :3],
                    jnp.asarray(dirs_cam))
    np.testing.assert_allclose(np.asarray(warped_rays[..., 0]),
                               np.asarray(o2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(warped_rays[..., 1]),
                               np.asarray(d2), rtol=2e-5, atol=2e-5)


@pytest.mark.fast
def test_rbk_weighted_sum_matches_manual_composition():
    """rbk_weighted_sum (standalone twin of the renderer's inline
    composition; upstream calls it at renderer.py:327-329) reduces
    flattened per-motion outputs with the composite weights."""
    from evdeblurnerf_tpu.models.blur_rbk import RigidBlurringModel

    model = RigidBlurringModel(view_embed_cnl=8, num_motion=2, feat_ch=0,
                               use_origin=True)
    num_pt = model.num_pt
    rng = np.random.default_rng(4)
    N = 6
    ccw = rng.dirichlet(np.ones(num_pt), size=N).astype(np.float32)
    rgb = rng.normal(size=(N * num_pt, 3)).astype(np.float32)
    depth = rng.normal(size=(N * num_pt,)).astype(np.float32)
    acc = rng.normal(size=(N * num_pt,)).astype(np.float32)
    extras = {"f": rng.normal(size=(N * num_pt, 4, 2)).astype(np.float32)}

    m = model.bind(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((N, 3, 2)), jnp.zeros((N, 8))))
    got_rgb, got_depth, got_acc, got_extras = m.rbk_weighted_sum(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(acc),
        {k: jnp.asarray(v) for k, v in extras.items()}, jnp.asarray(ccw))

    w = ccw[..., None]
    np.testing.assert_allclose(
        np.asarray(got_rgb), (rgb.reshape(N, num_pt, 3) * w).sum(1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_depth), (depth.reshape(N, num_pt) * ccw).sum(1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_acc), (acc.reshape(N, num_pt) * ccw).sum(1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_extras["f"]),
        (extras["f"].reshape(N, num_pt, 4, 2) * w[..., None]).sum(1),
        rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_dsk_dead_upstream_flags_fail_fast():
    """random_mode='output' raises NotImplementedError at the reference's
    first forward (pdrf/blurmodel.py:196); depth_embed reads a rays_info
    key no caller ever provides. Both fail at construction here."""
    from evdeblurnerf_tpu.models.blur_dsk import DSKBlurModel

    def build(**kw):
        m = DSKBlurModel(num_img=2, num_pt=3, kernel_hwindow=5,
                         kernel_type="DSK", img_embed_cnl=4, **kw)
        m.init(jax.random.PRNGKey(0), jax.random.PRNGKey(0),
               jnp.zeros((4,)), jnp.zeros((4,), jnp.int32),
               jnp.zeros((4, 4)), jnp.zeros((4, 3, 4)),
               rays_x=jnp.zeros((4,)), rays_y=jnp.zeros((4,)))

    with pytest.raises(NotImplementedError, match="output"):
        build(random_mode="output", random_hwindow=0.25)
    with pytest.raises(NotImplementedError, match="depth_embed"):
        build(depth_embed=4)
