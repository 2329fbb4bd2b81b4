import numpy as np
import pytest

from evdeblurnerf_tpu.utils import misc, pose, rays, voxels


def test_annealing_interpolators():
    lin = misc.annealing_interpolator(0.0, 1.0, 100, "linear")
    assert lin(0) == 0.0
    assert lin(100) == 1.0
    assert lin(50) == pytest.approx(0.5)

    cos = misc.annealing_interpolator(1.0, 0.0, 100, "cosine")
    assert cos(0) == 1.0
    assert cos(100) == 0.0
    assert cos(50) == pytest.approx(0.5)

    const = misc.annealing_interpolator(0.7, 0.0, 100, "constant")
    assert const(0) == const(99) == 0.7

    # start_step behavior (ref: utils/misc.py:15-55)
    cos2 = misc.annealing_interpolator(2.0, 4.0, 200, "cosine", start_step=100)
    assert cos2(50) == 2.0
    assert cos2(150) == pytest.approx(3.0)
    assert cos2(500) == 4.0


def test_exponential_fine_loss_weight():
    w0 = misc.exponential_scale_fine_loss_weight(30001, 1200, 0.1, 0.9, 1200)
    w1 = misc.exponential_scale_fine_loss_weight(30001, 1200, 0.1, 0.9, 30001)
    assert w0 == pytest.approx(0.1)
    assert w1 == pytest.approx(0.9)


def test_unit_conversion_and_int_compaction():
    assert misc.convert_unit("ns", "us") == pytest.approx(1e-3)
    assert misc.convert_unit("us", "us") == 1
    arr = np.array([1.0, 2.0, 250.0])
    out = misc.possibly_smallest_int(arr)
    assert out.dtype == np.uint8 or out.dtype == np.int16
    arr2 = np.array([0.5, 1.0])
    assert misc.possibly_smallest_int(arr2).dtype == arr2.dtype


def _random_llff_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        axis = rng.normal(size=3)
        axis = axis / np.linalg.norm(axis)
        angle = rng.uniform(0, 0.4)
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec(axis * angle).as_matrix()
        t = rng.normal(scale=0.2, size=3) + np.array([0, 0, 4.0])
        hwf = np.array([60.0, 80.0, 100.0]).reshape(3, 1)
        poses.append(np.concatenate([R, t[:, None], hwf], axis=1))
    return np.stack(poses).astype(np.float64)


def test_recenter_replay_invariant():
    poses = _random_llff_poses(7)
    recentered, c2w = pose.recenter_poses(poses.copy(), return_c2w=True)
    replayed = pose.recenter_poses(poses.copy(), c2w=c2w)
    np.testing.assert_allclose(recentered, replayed, atol=1e-10)
    assert pose.is_pure_rotation_matrix(recentered[:, :3, :3])


def test_spherify_replay_invariant():
    poses = _random_llff_poses(9, seed=3)
    bds = np.abs(np.random.default_rng(0).normal(size=(9, 2))) + 1.0
    p1, r1, b1, state = pose.spherify_poses(poses.copy(), bds.copy(),
                                            return_state=True)
    p2, r2, b2 = pose.spherify_poses(poses.copy(), bds.copy(), state=state)
    np.testing.assert_allclose(p1, p2, atol=1e-10)
    np.testing.assert_allclose(r1, r2, atol=1e-10)
    np.testing.assert_allclose(b1, b2, atol=1e-10)


def test_slerp_interpolator_matches_scipy_at_knots():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(5)
    n = 6
    tss = np.sort(rng.uniform(0, 100, size=n))
    rots = Rotation.random(n, random_state=1).as_matrix()
    trans = rng.normal(size=(n, 3))
    interp = pose.get_slerp_interpolator(tss, rots, trans)
    r_out, t_out = interp(tss)
    np.testing.assert_allclose(r_out, rots, atol=1e-10)
    np.testing.assert_allclose(t_out, trans, atol=1e-8)
    # clipping outside the range
    r_clip, t_clip = interp(np.array([tss[0] - 10, tss[-1] + 10]))
    np.testing.assert_allclose(r_clip[0], rots[0], atol=1e-10)
    np.testing.assert_allclose(t_clip[1], trans[-1], atol=1e-8)


def test_get_rays_pinhole_geometry():
    H, W = 4, 6
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    c2w = np.eye(4)[:3]
    rays_o, rays_d = rays.get_rays_np(H, W, K, c2w)
    assert rays_o.shape == (H, W, 3) and rays_d.shape == (H, W, 3)
    # all origins at camera center
    np.testing.assert_allclose(rays_o, 0.0)
    # central pixel: with half-pixel offset the ray between the two central
    # columns points straight down -z in x
    np.testing.assert_allclose(rays_d[..., 2], -1.0)
    # x increases to the right, y decreases downward (OpenGL convention)
    assert rays_d[0, -1, 0] > rays_d[0, 0, 0]
    assert rays_d[-1, 0, 1] < rays_d[0, 0, 1]


def test_get_rays_pix_matches_get_rays():
    H, W = 5, 7
    K = np.array([[90.0, 0, 3.1], [0, 95.0, 2.7], [0, 0, 1]])
    rng = np.random.default_rng(11)
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=2).as_matrix()
    c2w = np.concatenate([R, rng.normal(size=(3, 1))], 1)
    all_o, all_d = rays.get_rays_np(H, W, K, c2w)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    pix_o, pix_d = rays.get_rays_pix_np(coords, K, c2w[None])
    np.testing.assert_allclose(pix_o, all_o.reshape(-1, 3), atol=1e-6)
    np.testing.assert_allclose(pix_d, all_d.reshape(-1, 3), atol=1e-5)


def test_ndc_rays_near_plane():
    H, W, focal = 8, 10, 50.0
    rng = np.random.default_rng(13)
    rays_o = rng.normal(size=(20, 3)).astype(np.float32)
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0
    rays_d = rng.normal(size=(20, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    o_ndc, d_ndc = rays.get_ndc_rays_np(H, W, focal, 1.0, rays_o, rays_d)
    # At the near plane, o2 = 1 + 2*near/oz where oz = -near → o2 = -1
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-5)
    # d2 = 1 - o2 = 2
    np.testing.assert_allclose(d_ndc[:, 2], 2.0, atol=1e-5)
    # jnp twin agrees
    import jax.numpy as jnp
    o2, d2 = rays.get_ndc_rays(H, W, focal, 1.0, jnp.asarray(rays_o),
                               jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(o2), o_ndc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), d_ndc, atol=1e-5)


def test_bbox3d_ndc_bounds():
    poses = _random_llff_poses(4, seed=7)[:, :3, :]
    hwf = (8, 10, 50.0)
    mn, mx = voxels.get_bbox3d_for_llff(poses[:, :3, :4], hwf, is_ndc=True)
    assert mn.shape == (3,) and mx.shape == (3,)
    assert np.all(mx > mn)


def test_render_paths():
    poses = _random_llff_poses(5, seed=9)
    c2w = pose.poses_avg(poses)
    up = pose.normalize(poses[:, :3, 1].sum(0))
    spiral = pose.render_path_spiral(c2w, up, [0.5, 0.5, 0.5], 2.0, 0.1,
                                     zrate=0.5, rots=2, N=12)
    assert len(spiral) == 12 and spiral[0].shape == (3, 5)
    epi = pose.render_path_epi(c2w, up, 0.5, 10)
    assert len(epi) == 10 and epi[0].shape == (3, 5)
    for p in spiral + epi:
        assert pose.is_pure_rotation_matrix(p[None, :3, :3])
