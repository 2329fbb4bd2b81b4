import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops import compositing, sample_pdf, triplane
from evdeblurnerf_tpu.utils import se3


# ---------------------------------------------------------------------------
# grid sampling parity vs torch.nn.functional.grid_sample
# ---------------------------------------------------------------------------

def test_grid_sample_2d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    C, H, W, N = 5, 9, 7, 200
    plane = rng.normal(size=(C, H, W)).astype(np.float32)
    # include points outside [-1, 1] to exercise zeros padding
    coords = rng.uniform(-1.3, 1.3, size=(N, 2)).astype(np.float32)

    ours = np.asarray(triplane.grid_sample_2d(
        jnp.asarray(plane), jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1])))

    torch_out = F.grid_sample(
        torch.tensor(plane)[None], torch.tensor(coords)[None, :, None, :],
        align_corners=True, padding_mode="zeros")
    torch_out = torch_out[0, :, :, 0].T.numpy()  # [N, C]

    np.testing.assert_allclose(ours, torch_out, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch_line_grid():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    C, D, N = 4, 11, 150
    line = rng.normal(size=(C, D)).astype(np.float32)
    y = rng.uniform(-1.1, 1.1, size=(N,)).astype(np.float32)

    ours = np.asarray(triplane.grid_sample_1d(jnp.asarray(line), jnp.asarray(y)))

    # reference formulation: [1, C, D, 1] grid sampled at (x=0, y)
    grid = torch.stack([torch.zeros(N), torch.tensor(y)], dim=-1)[None, :, None, :]
    torch_out = F.grid_sample(torch.tensor(line)[None, :, :, None], grid,
                              align_corners=True, padding_mode="zeros")
    torch_out = torch_out[0, :, :, 0].T.numpy()

    np.testing.assert_allclose(ours, torch_out, rtol=1e-5, atol=1e-5)


def test_triplane_features_shape_and_grad():
    rng = np.random.default_rng(2)
    n_comp = [8, 4, 4]
    grid = [6, 7, 5]
    planes = [jnp.asarray(rng.normal(size=(n_comp[i],
                                           grid[triplane.MAT_MODE[i][1]],
                                           grid[triplane.MAT_MODE[i][0]]))
                          .astype(np.float32)) for i in range(3)]
    lines = [jnp.asarray(rng.normal(size=(n_comp[i], grid[triplane.VEC_MODE[i]]))
                         .astype(np.float32)) for i in range(3)]
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))

    feats = triplane.triplane_features(planes, lines, xyz)
    assert feats.shape == (64, sum(n_comp))

    def loss(planes, lines):
        return jnp.sum(triplane.triplane_features(planes, lines, xyz) ** 2)

    grads = jax.grad(loss)(planes, lines)
    assert all(g.shape == p.shape for g, p in zip(grads, planes))
    assert all(bool(jnp.isfinite(g).all()) for g in grads)


def test_tv_loss_matches_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 6, 5)).astype(np.float32)

    # reference TVLoss (ref: voxnerf.py:306-324) on [1, C, H, W]
    xt = torch.tensor(x)[None]
    count_h = xt[:, :, 1:, :].numel()
    count_w = max(xt[:, :, :, 1:].numel(), 1)
    h_tv = ((xt[:, :, 1:, :] - xt[:, :, :-1, :]) ** 2).sum()
    w_tv = ((xt[:, :, :, 1:] - xt[:, :, :, :-1]) ** 2).sum()
    expected = (2 * (h_tv / count_h + w_tv / count_w)).item()

    ours = float(triplane.tv_loss_2d(jnp.asarray(x)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


# ---------------------------------------------------------------------------
# sample_pdf
# ---------------------------------------------------------------------------

def _sample_pdf_reference(bins, weights, u):
    """Numpy transcription of ref: utils/rays.py:149-193 given fixed u."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                     for i in range(cdf.shape[0])])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_searchsorted_right_matches_numpy():
    rng = np.random.default_rng(4)
    seq = np.sort(rng.uniform(size=(8, 17)), axis=-1)
    vals = rng.uniform(size=(8, 9))
    ours = np.asarray(sample_pdf.searchsorted_right(jnp.asarray(seq), jnp.asarray(vals)))
    expected = np.stack([np.searchsorted(seq[i], vals[i], side="right")
                         for i in range(8)])
    np.testing.assert_array_equal(ours, expected)


def test_sample_pdf_det_matches_reference():
    rng = np.random.default_rng(5)
    R, M, N = 16, 13, 8
    bins = np.sort(rng.uniform(0, 1, size=(R, M)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, M - 1)).astype(np.float32)

    ours = np.asarray(sample_pdf.sample_pdf(
        jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), N, det=True))
    u = np.broadcast_to(np.linspace(0, 1, N, dtype=np.float32), (R, N))
    expected = _sample_pdf_reference(bins, weights, u)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_sample_pdf_stochastic_within_support():
    rng = np.random.default_rng(6)
    R, M, N = 4, 9, 32
    bins = np.sort(rng.uniform(2, 6, size=(R, M)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, M - 1)).astype(np.float32)
    samples = np.asarray(sample_pdf.sample_pdf(
        jax.random.PRNGKey(1), jnp.asarray(bins), jnp.asarray(weights), N))
    assert samples.shape == (R, N)
    assert (samples >= bins[:, :1] - 1e-5).all()
    assert (samples <= bins[:, -1:] + 1e-5).all()


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------

def _raw2outputs_reference(sigma, rgb, z_vals, rays_d):
    """Numpy transcription of ref: voxnerf.py:153-201 (no noise, relu)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    density = np.maximum(sigma[..., :-1], 0.0)
    alpha = 1.0 - np.exp(-density * dists)
    alpha = np.concatenate([alpha, np.ones_like(alpha[:, :1])], -1)
    weights = alpha * np.cumprod(
        np.concatenate([np.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1),
        -1)[:, :-1]
    rgb_map = np.sum(weights[..., None] * rgb, -2)
    depth_map = np.sum(weights * z_vals, -1)
    acc_map = np.sum(weights, -1)
    return rgb_map, depth_map, acc_map, weights


def test_compositing_matches_reference():
    rng = np.random.default_rng(7)
    R, S = 12, 10
    sigma = rng.normal(size=(R, S)).astype(np.float32)
    rgb = rng.uniform(size=(R, S, 3)).astype(np.float32)
    z_vals = np.sort(rng.uniform(0, 1, size=(R, S)), -1).astype(np.float32)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)

    weights = compositing.compute_weights(
        jnp.asarray(sigma), jnp.asarray(z_vals), jnp.asarray(rays_d),
        sigma_activate=jax.nn.relu)
    rgb_map, depth_map, acc_map = compositing.composite(
        weights, jnp.asarray(rgb), jnp.asarray(z_vals))

    # the numpy transcription accumulates in float64; allow f32 noise
    e_rgb, e_depth, e_acc, e_w = _raw2outputs_reference(sigma, rgb, z_vals, rays_d)
    np.testing.assert_allclose(np.asarray(weights), e_w, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb_map), e_rgb, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth_map), e_depth, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(acc_map), e_acc, rtol=1e-3, atol=2e-5)


def test_white_background():
    weights = jnp.asarray([[0.2, 0.3]])
    rgb = jnp.ones((1, 2, 3)) * 0.5
    z = jnp.asarray([[0.1, 0.9]])
    rgb_map, _, acc = compositing.composite(weights, rgb, z, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb_map), 0.25 + (1 - 0.5), rtol=1e-6)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def test_exp_so3_matches_scipy():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(8)
    w = rng.normal(size=(10, 3))
    theta = np.linalg.norm(w, axis=-1)
    axis = w / theta[:, None]
    ours = np.asarray(se3.exp_so3(jnp.asarray(axis), jnp.asarray(theta)))
    expected = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-6)


def test_exp_se3_zero_rotation_small_angle():
    # tiny rotation -> transform approaches pure translation by v
    rot = jnp.asarray([[1e-8, 0.0, 0.0]])
    trans = jnp.asarray([[0.3, -0.2, 0.5]])
    T = np.asarray(se3.se3_transform_from_rot_trans(rot, trans))
    np.testing.assert_allclose(T[0, :3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[0, :3, 3], [0.3, -0.2, 0.5], atol=1e-5)
    np.testing.assert_allclose(T[0, 3], [0, 0, 0, 1], atol=0)


def test_se3_warp_points_roundtrip():
    rng = np.random.default_rng(9)
    rot = jnp.asarray(rng.normal(scale=0.3, size=(5, 3)).astype(np.float32))
    trans = jnp.asarray(rng.normal(scale=0.3, size=(5, 3)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    T = se3.se3_transform_from_rot_trans(rot, trans)
    warped = se3.se3_warp_points(pts, T)
    # invert and warp back
    T_inv = jnp.linalg.inv(T)
    back = se3.se3_warp_points(warped, T_inv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_cumprod_custom_vjp_matches_autodiff():
    """Division-form cumprod backward vs differentiating jnp.cumprod."""
    import jax

    rng = np.random.default_rng(7)
    # strictly positive factors incl. the 1e-10 floor case
    x = jnp.asarray(rng.uniform(0.05, 1.0, (9, 33)), jnp.float32)
    x = x.at[:, -1].set(1e-10)
    g = jnp.asarray(rng.normal(size=(9, 33)), jnp.float32)

    def f_custom(x):
        return jnp.sum(compositing._cumprod_lanes(x) * g)

    def f_ref(x):
        return jnp.sum(jnp.cumprod(x, -1) * g)

    gc = jax.grad(f_custom)(x)
    gr = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                               rtol=2e-4, atol=1e-5)
