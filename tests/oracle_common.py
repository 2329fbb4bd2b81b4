"""Shared spec for the reference-oracle parity suite.

Defines tiny, fully deterministic model variants (no stratified jitter, no
pattern jitter, no sigma noise) that BOTH sides can run:

* the jax side (this framework) via :func:`build_model` / :func:`run_jax`;
* the torch side (the actual reference implementation at /root/reference)
  via ``tools/make_reference_fixtures.py``, which transplants the very same
  parameter values into the reference modules and records their outputs as
  ``tests/goldens/oracle_<name>.npz``.

``tests/test_reference_parity.py`` then replays the jax side against the
recorded reference outputs — converting "PSNR within 0.1 dB of reference"
from an aspiration into a unit-checkable claim, without needing torch or
the reference checkout at test time.

Reference code exercised: networks/renderer.py:129-466 (render_rays /
render / training forward), networks/pdrf/blurmodel.py:109-224 (DSK/PBE),
networks/dpnerf/{blurmodel,awp,mam}.py (RBK + AWP + MAM),
networks/tonemapping.py:7-154 (CRF), utils/rays.py:103-193 (NDC +
sample_pdf), utils/events.py:260-284 (egm_loss).

The AWP widths are pinned to the paper's (W_sam=64, W_mot=32) because the
reference MAM hard-codes ``nn.Linear(64, 32)`` (mam.py:60) and its Corr
convs require ``W_mot == 32`` for shape consistency — smaller test widths
simply cannot run through the reference.
"""

import os

import jax
import numpy as np

from evdeblurnerf_tpu.config import default_args
from evdeblurnerf_tpu.models.renderer import RenderConfig
from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                            kernel_config_from_args)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
N = 16
H, W, FOCAL = 64, 80, 60.0
K = ((FOCAL, 0.0, W / 2), (0.0, FOCAL, H / 2), (0.0, 0.0, 1.0))
AABB = ((-1.6, -1.6, -1.0), (1.6, 1.6, 1.0))
N_SAMPLES = 4
N_IMPORTANCE = 4
NUM_IMAGES = 4

VARIANTS = {
    "rbk_awp": dict(kernel_type="RBK", kernel_ptnum=3,
                    kernel_rbk_use_origin=True, kernel_use_awp=True),
    "dsk": dict(kernel_type="DSK", kernel_ptnum=3, kernel_spatial_embed=2),
    "pbe": dict(kernel_type="PBE", kernel_ptnum=3),
    # vanilla-NeRF field family (ref networks/nerf.py) with the RBK kernel
    "nerf_rbk": dict(kernel_type="RBK", kernel_ptnum=3,
                     kernel_rbk_use_origin=True, mode="nerf",
                     rgb_add_bias=True, netdepth=2, netwidth=16,
                     netdepth_fine=2, netwidth_fine=16),
}


def make_args(overrides):
    """Flag set for one oracle variant — deterministic by construction."""
    base = dict(
        N_rand=N, N_samples=N_SAMPLES, N_importance=N_IMPORTANCE, chunk=4096,
        mode="c2f", kernel_img_embed=8, kernel_rbk_extra_feat_ch=0,
        kernel_start_iter=0, use_viewdirs=True, multires=4, multires_views=2,
        perturb=0.0,                     # no stratified jitter
        kernel_random_hwindow=0.0,       # no DSK pattern jitter
        raw_noise_std=0.0,
        # paper AWP dims — the only ones the reference can run (see module
        # docstring)
        kernel_awp_sam_emb_depth=2, kernel_awp_sam_emb_width=64,
        kernel_awp_mot_emb_depth=1, kernel_awp_mot_emb_width=32,
        seed=0)
    base.update(overrides)
    return default_args(**base)


def make_cfg(args):
    return RenderConfig(
        mode=args.mode, N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
        use_viewdirs=True, multires=4, multires_views=2, ndc=True,
        near=0.0, far=1.0, H=H, W=W, focal=FOCAL, perturb=0.0,
        rgb_add_bias=args.rgb_add_bias,
        netdepth=args.netdepth, netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine, netwidth_fine=args.netwidth_fine,
        aabb=AABB, coarse_n_voxels=4096, fine_n_voxels=8192,
        coarse_app_n_comp=(4, 2, 2), fine_app_n_comp=(4, 2, 2),
        coarse_hidden_dim=8, coarse_hidden_dim_color=8,
        fine_hidden_dim=8, fine_hidden_dim_color=8,
        fine_geo_feat_dim=8, coarse_app_dim=8, fine_app_dim=8,
        kernel_feat_cnl=15, kernel_type=args.kernel_type,
        use_awp=args.kernel_use_awp)


def build_model(name):
    args = make_args(VARIANTS[name])
    cfg = make_cfg(args)
    kcfg = kernel_config_from_args(args)
    return EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=NUM_IMAGES, K=K)


def make_inputs():
    rng = np.random.default_rng(11)
    rays_o = rng.normal(size=(N, 3)).astype(np.float32) * 0.05
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5
    rays = np.stack([rays_o, rays_d], axis=-1)
    rays_info = {
        "rays_x": rng.uniform(0, W, N).astype(np.float32),
        "rays_y": rng.uniform(0, H, N).astype(np.float32),
        "images_idx": rng.integers(0, NUM_IMAGES, N).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N, 3, 4)).astype(np.float32).copy(),
    }
    return rays, rays_info


def init_variant(name):
    """Random (seeded) parameter/batch-stat tree for one variant."""
    model = build_model(name)
    rays, rays_info = make_inputs()
    variables = model.init(jax.random.PRNGKey(5), jax.random.PRNGKey(6),
                           rays, rays_info, force_naive=False,
                           return_pts0_rgb=True)
    return model, dict(variables)


def flatten(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


def restore_like(template, flat):
    import jax.numpy as jnp

    leaves_p = jax.tree_util.tree_leaves_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    leaves = [jnp.asarray(flat[jax.tree_util.keystr(p)])
              for p, _ in leaves_p]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def run_jax(name, variables):
    """Deterministic train forward + eval render; returns name->np.ndarray."""
    model = build_model(name)
    rays, rays_info = make_inputs()

    mutable = ["batch_stats"] if "batch_stats" in variables else False
    out = model.apply(variables, jax.random.PRNGKey(0), rays, rays_info,
                      force_naive=False, return_pts0_rgb=True,
                      mutable=mutable)
    if mutable:
        out, _ = out
    rgb, rgb1, other_loss, other_tensors = out

    rec = {"rgb": rgb}
    if rgb1 is not None:
        rec["rgb1"] = rgb1
    for k, v in other_loss.items():
        rec[f"loss/{k}"] = v
    for k in ("rgb_awp", "stage0_rgb_pts0", "stage1_rgb_pts0",
              "stage1_rgb1_pts0"):
        if other_tensors.get(k) is not None:
            rec[f"tensor/{k}"] = other_tensors[k]

    ret = model.apply(variables, jax.random.PRNGKey(0), rays,
                      is_train=False, perturb=0.0,
                      method=lambda m, k, r, **kw: m.renderer.render(
                          k, r, **kw))
    rec["eval/rgb_map"] = ret["rgb_map"]
    rec["eval/depth_map"] = ret["depth_map"]
    rec["eval/acc_map"] = ret["acc_map"]
    if ret.get("rgb0") is not None:
        rec["eval/rgb0"] = ret["rgb0"]
    return {k: np.asarray(v) for k, v in rec.items()}


def oracle_path(name):
    return os.path.join(GOLDEN_DIR, f"oracle_{name}.npz")


# ---------------------------------------------------------------------------
# component-level oracles (CRF, egm_loss, sample_pdf)
# ---------------------------------------------------------------------------

def make_crf_inputs():
    rng = np.random.default_rng(21)
    x = rng.uniform(0.01, 0.99, size=(32, 3)).astype(np.float32)
    bii_feat = rng.normal(size=(32, 2)).astype(np.float32)
    return x, bii_feat


def build_crf():
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform

    return TonemappingTransform(map_type_rgb="gamma", map_type_event="learn",
                                gamma=2.2, luma_standard="rec601",
                                extra_features_event=2)


def run_jax_crf(params):
    crf = build_crf()
    x, bii_feat = make_crf_inputs()
    rec = {
        "encode_rgb": crf.apply(params, x, mode="encode_rgb"),
        "encode_luma": crf.apply(params, x, mode="encode_luma",
                                 ev_extra_feat=bii_feat),
        "encode_luma_nofeat": crf.apply(params, x, mode="encode_luma"),
        "encode_luma_tonemap_only": crf.apply(
            params, x, mode="encode_luma", ev_extra_feat=bii_feat,
            tonemap_only=True),
        "encode_luma_skip": crf.apply(params, x, mode="encode_luma",
                                      skip_learn_crf=True),
    }
    return {k: np.asarray(v) for k, v in rec.items()}


def make_egm_inputs():
    rng = np.random.default_rng(22)
    luma_start = rng.uniform(0.05, 1.0, size=(64, 3)).astype(np.float32)
    luma_end = rng.uniform(0.05, 1.0, size=(64, 3)).astype(np.float32)
    bii = rng.normal(size=(64,)).astype(np.float32)
    onehot = np.eye(3, dtype=bool)[rng.integers(0, 3, 64)]
    color_weight = np.array([1.0, 0.5, 2.0], np.float32)
    mono_start = rng.uniform(0.05, 1.0, size=(64, 1)).astype(np.float32)
    mono_end = rng.uniform(0.05, 1.0, size=(64, 1)).astype(np.float32)
    return luma_start, luma_end, bii, onehot, color_weight, mono_start, mono_end


def run_jax_egm():
    from evdeblurnerf_tpu.utils.events import egm_loss

    ls, le, bii, mask, cw, ms, me = make_egm_inputs()
    return {
        "mono": np.asarray(egm_loss(ms, me, bii)),
        "color": np.asarray(egm_loss(ls, le, bii, color_mask=mask)),
        "color_weighted": np.asarray(
            egm_loss(ls, le, bii, color_mask=mask, color_weight=cw)),
    }


def make_pdf_inputs():
    rng = np.random.default_rng(23)
    bins = np.sort(rng.uniform(0, 1, size=(8, 7)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(8, 6)).astype(np.float32)
    weights[2] = 0.0  # degenerate-denominator branch
    return bins, weights


def run_jax_pdf():
    import jax.numpy as jnp

    from evdeblurnerf_tpu.ops.sample_pdf import sample_pdf

    bins, weights = make_pdf_inputs()
    out = sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                     jnp.asarray(weights), 5, det=True)
    return {"det": np.asarray(out)}


# ---------------------------------------------------------------------------
# gradient-parity oracle: d loss / d params vs the torch reference
# ---------------------------------------------------------------------------

def make_grad_target():
    rng = np.random.default_rng(31)
    return rng.uniform(0, 1, (N, 3)).astype(np.float32)


def run_jax_grads(name, variables):
    """Gradients of mean((rgb-target)^2) + TV + align wrt every parameter.

    The strongest training-dynamics parity evidence: identical weights,
    identical deterministic forward, identical loss — the full backward
    through kernel expansion, dual-stage render, AWP and the factored
    grids must then match the reference's autograd parameter-by-parameter.
    """
    import jax
    import jax.numpy as jnp

    model = build_model(name)
    rays, rays_info = make_inputs()
    target = jnp.asarray(make_grad_target())
    batch_stats = variables.get("batch_stats")

    def loss_fn(params):
        vs = {"params": params}
        mutable = False
        if batch_stats is not None:
            vs["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = model.apply(vs, jax.random.PRNGKey(0), rays, rays_info,
                          force_naive=False, return_pts0_rgb=True,
                          mutable=mutable)
        if mutable:
            out, _ = out
        rgb, rgb1, other_loss, _ = out
        loss = jnp.mean((rgb - target) ** 2)
        for v in other_loss.values():
            loss = loss + jnp.sum(v)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    # key layout matches flatten(variables): leading ['params'] component
    return {"['params']" + jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(grads)}
