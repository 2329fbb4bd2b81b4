import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.models import embedding, renderer, tonemapping, voxnerf
from evdeblurnerf_tpu.models.layers import TorchLinear


def test_positional_encoding_matches_reference_layout():
    # ref: networks/embedding.py:88-98 — [input, sin(f0 x), cos(f0 x), ...]
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = embedding.positional_encoding(x, multires=3)
    assert out.shape == (1, 3 * (1 + 2 * 3))
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x[0])), rtol=1e-6)
    assert embedding.positional_encoding_dim(10) == 63
    assert embedding.positional_encoding_dim(4) == 27


def test_view_embeddings():
    ve = embedding.ViewEmbedding(num_embed=5, embed_dim=8, init_params="zero")
    params = ve.init(jax.random.PRNGKey(0), jnp.asarray([0, 2]))
    out = ve.apply(params, jnp.asarray([1, 4, 4]))
    assert out.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0)

    vemlp = embedding.ViewEmbeddingMLP(num_embed=5, embed_dim=8, D=4, W=16,
                                       skips=(2,), init_params="normal")
    params = vemlp.init(jax.random.PRNGKey(1), jnp.asarray([0]))
    out = vemlp.apply(params, jnp.asarray([0, 3]))
    assert out.shape == (2, 16)


def test_torch_linear_init_statistics():
    layer = TorchLinear(64)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    bound = 1.0 / np.sqrt(100)
    assert k.shape == (100, 64)
    assert np.abs(k).max() <= bound and np.abs(b).max() <= bound
    # uniform distribution should roughly fill the range
    assert np.abs(k).max() > 0.8 * bound


def test_voxnerf_grid_size_matches_reference_formula():
    torch = pytest.importorskip("torch")
    aabb_min = np.array([-1.2, -1.1, -0.1], np.float32)
    aabb_max = np.array([1.3, 1.05, 1.0], np.float32)
    for n_voxels in (16777248, 134217984, 100000):
        ours = voxnerf.compute_grid_size(aabb_min, aabb_max, n_voxels)
        xyz_min, xyz_max = torch.tensor(aabb_min), torch.tensor(aabb_max)
        voxel_size = ((xyz_max - xyz_min).prod() / n_voxels).pow(1 / 3)
        expected = tuple(((xyz_max - xyz_min) / voxel_size).long().tolist())
        assert ours == expected, (n_voxels, ours, expected)


def _tiny_cfg(**kw):
    base = dict(
        mode="c2f", N_samples=8, N_importance=8, perturb=1.0,
        use_viewdirs=True, multires=4, multires_views=2, raw_noise_std=1.0,
        ndc=False, near=0.5, far=3.0, H=16, W=16, focal=20.0,
        aabb=((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0)),
        coarse_n_voxels=4096, fine_n_voxels=32768,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=16, coarse_hidden_dim_color=16,
        fine_hidden_dim=16, fine_hidden_dim_color=16,
        coarse_app_dim=8, fine_app_dim=8, fine_geo_feat_dim=16,
        kernel_feat_cnl=15,
    )
    base.update(kw)
    return renderer.RenderConfig(**base)


def test_renderer_c2f_shapes_and_finiteness():
    cfg = _tiny_cfg()
    model = renderer.Renderer(cfg)
    R = 12
    rays = jnp.asarray(np.random.default_rng(0).normal(
        size=(R, 3, 2)).astype(np.float32))
    rays = rays.at[..., 2, 1].set(-1.0)  # forward-facing dirs
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays)
    ret = model.apply(params, jax.random.PRNGKey(2), rays, is_train=True)
    S_all = cfg.N_samples + cfg.N_importance
    assert ret["rgb_map"].shape == (R, 3)
    assert ret["rgb0"].shape == (R, 3)
    assert ret["depth_map"].shape == (R,)
    assert ret["weights"].shape == (R, S_all)
    assert ret["depth_feature"].shape == (R, S_all, cfg.fine_geo_feat_dim)
    for k, v in ret.items():
        assert bool(jnp.isfinite(v).all()), f"{k} has non-finite values"
    assert float(ret["rgb_map"].min()) >= 0.0
    assert float(ret["rgb_map"].max()) <= 1.0


def test_renderer_nerf_mode():
    cfg = _tiny_cfg(mode="nerf", netdepth=2, netwidth=32, netdepth_fine=2,
                    netwidth_fine=32, white_bkgd=True, raw_noise_std=0.0)
    model = renderer.Renderer(cfg)
    R = 6
    rays = jnp.asarray(np.random.default_rng(1).normal(
        size=(R, 3, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays)
    ret = model.apply(params, jax.random.PRNGKey(2), rays, is_train=False)
    assert ret["rgb_map"].shape == (R, 3)
    assert bool(jnp.isfinite(ret["rgb_map"]).all())


def test_renderer_eval_deterministic():
    cfg = _tiny_cfg(raw_noise_std=0.0)
    model = renderer.Renderer(cfg)
    rays = jnp.asarray(np.random.default_rng(2).normal(
        size=(5, 3, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays)
    r1 = model.apply(params, jax.random.PRNGKey(7), rays, is_train=False)
    r2 = model.apply(params, jax.random.PRNGKey(8), rays, is_train=False)
    # eval uses perturb=0 and no noise: different keys give identical output
    np.testing.assert_allclose(np.asarray(r1["rgb_map"]),
                               np.asarray(r2["rgb_map"]), atol=1e-6)


def test_crf_gamma_and_luma():
    tm = tonemapping.TonemappingTransform(map_type_rgb="gamma",
                                          map_type_event="none", gamma=2.2)
    params = tm.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
    x = jnp.asarray([[0.25, 0.5, 1.0]])
    out = tm.apply(params, x, mode="encode_rgb")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) ** (1 / 2.2),
                               rtol=1e-6)
    luma = tm.apply(params, x, mode="encode_luma")
    expected = 0.299 * 0.25 + 0.587 * 0.5 + 0.114 * 1.0
    np.testing.assert_allclose(np.asarray(luma), [[expected]], rtol=1e-6)


def test_crf_learn_identity_prefit():
    crf = tonemapping.CRF(map_type="learn", extra_features=2)
    x = jnp.ones((4, 3)) * 0.3
    params = crf.init(jax.random.PRNGKey(0), x)["params"]
    fitted = tonemapping.crf_init_identity(crf, params, jax.random.PRNGKey(1),
                                           steps=3000)
    xs = jnp.asarray(np.linspace(0.05, 0.95, 30, dtype=np.float32)
                     .reshape(10, 3))
    out = crf.apply({"params": fitted}, xs)
    raw = jax.nn.sigmoid(xs)  # what an unfitted ~zero-residual CRF returns
    err = float(jnp.abs(out - xs).max())
    err_mid = float(jnp.abs(out - xs)[2:8].max())
    # the 0.1-scaled residual architecture converges slowly at the domain
    # edges (same behavior as the reference's 3000-step pre-fit); the fit
    # must be far closer to identity than the unfitted sigmoid
    assert err < 0.08, f"identity pre-fit error too large: {err}"
    assert err_mid < 0.03, f"identity pre-fit mid-range error: {err_mid}"
    assert err < 0.3 * float(jnp.abs(raw - xs).max())
    # skip_learn returns input unchanged
    out_skip = crf.apply({"params": fitted}, xs, skip_learn=True)
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(xs))


def test_crf_extra_features_zero_padding():
    crf = tonemapping.CRF(map_type="learn", extra_features=2)
    x = jnp.ones((4, 3)) * 0.5
    variables = crf.init(jax.random.PRNGKey(0), x)
    no_feat = crf.apply(variables, x)
    zero_feat = crf.apply(variables, x, x_feat=jnp.zeros((4, 2)))
    np.testing.assert_allclose(np.asarray(no_feat), np.asarray(zero_feat),
                               atol=1e-7)


@pytest.mark.fast
def test_positional_encoding_double_angle():
    """Double-angle recurrence PE: same layout/order as the exact form,
    values within the f32 recurrence error (~2^m ulp), far below bf16
    resolution — the bf16 eval-render gate in voxnerf.__call__."""
    from evdeblurnerf_tpu.models.embedding import positional_encoding

    x = jnp.asarray(np.random.default_rng(0).uniform(-4, 4, (257, 3)),
                    jnp.float32)
    for m in (4, 10):
        exact = positional_encoding(x, m)
        fast = positional_encoding(x, m, double_angle=True)
        assert fast.shape == exact.shape
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   atol=3e-4)
        # after bf16 rounding the residual stays below half a bf16 ulp at
        # the sine's unit amplitude (near zero-crossings the *relative*
        # error is large but the absolute error is what the downstream
        # bf16 matmul consumes)
        f16 = np.asarray(fast.astype(jnp.bfloat16), np.float32)
        e16 = np.asarray(exact.astype(jnp.bfloat16), np.float32)
        assert np.abs(f16 - e16).max() <= 2.0 ** -8 + 1e-7


def test_awp_unsupported_combinations_fail_fast():
    """RBK+AWP without origin and PBE+AWP without a fine pass crash with
    opaque shape errors upstream (the reference hardcodes AWP
    use_origin=True, run_nerf.py:224, and asserts the PBE case,
    renderer.py:31); here both fail at construction with the constraint."""
    import pytest

    from evdeblurnerf_tpu.models.renderer import RenderConfig
    from evdeblurnerf_tpu.models.system import EvDeblurNeRF, KernelConfig

    K = ((50.0, 0.0, 20.0), (0.0, 50.0, 16.0), (0.0, 0.0, 1.0))
    cfg = RenderConfig(
        mode="c2f", N_samples=4, N_importance=4, use_viewdirs=True,
        multires=4, multires_views=2, ndc=True, near=0.0, far=1.0,
        H=32, W=40, focal=50.0,
        aabb=((-1.6, -1.6, -1.0), (1.6, 1.6, 1.0)),
        coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=8, fine_app_dim=8,
        kernel_type="RBK", use_awp=True)
    kcfg = KernelConfig(kernel_type="RBK", ptnum=3, use_awp=True,
                        rbk_use_origin=False)
    rays = jnp.zeros((8, 3, 2))
    with pytest.raises(ValueError, match="kernel_rbk_use_origin"):
        EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=3, K=K).init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), rays, None,
            force_naive=True)

    import dataclasses

    cfg0 = dataclasses.replace(cfg, N_importance=0, kernel_type="PBE")
    kcfg0 = KernelConfig(kernel_type="PBE", ptnum=3, use_awp=True)
    with pytest.raises(ValueError, match="N_importance == 0"):
        EvDeblurNeRF(cfg=cfg0, kcfg=kcfg0, num_images=3, K=K).init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), rays, None,
            force_naive=True)
