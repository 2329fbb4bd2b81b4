#!/usr/bin/env python
"""Generate reference-oracle parity fixtures.

Loads the ACTUAL reference implementation (PyTorch, /root/reference) on CPU,
builds each tiny deterministic variant from tests/oracle_common.py, transplants
the jax-initialized parameters into the reference modules, runs the reference
training forward + eval render (+ CRF / egm_loss / sample_pdf component
oracles), verifies the jax side agrees, and records the REFERENCE outputs to
tests/goldens/oracle_*.npz.

The committed fixtures make cross-implementation parity checkable by
tests/test_reference_parity.py without torch or the reference checkout.

Usage: JAX_PLATFORMS=cpu python tools/make_reference_fixtures.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("EVDN_REFERENCE", "/root/reference")

sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)
# the reference's intra-repo imports (networks.*, utils.*) resolve against
# its own root; it must shadow nothing of ours (our package is namespaced)
sys.path.insert(0, REFERENCE)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

# the reference hard-codes .cuda() on the voxel-field aabb
# (networks/pdrf/voxnerf.py:86); neutralize it for the CPU oracle
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

# the reference imports kornia only for create_meshgrid (utils/rays.py:3);
# kornia is absent here, so provide a faithful minimal shim
if "numba" not in sys.modules:
    import types

    _numba = types.ModuleType("numba")
    _numba.njit = lambda *a, **k: (a[0] if a and callable(a[0])
                                   else (lambda f: f))
    sys.modules["numba"] = _numba

if "kornia" not in sys.modules:
    import types

    def _create_meshgrid(height, width, normalized_coordinates=True,
                         device=None, dtype=None):
        xs = torch.linspace(0, width - 1, width, dtype=dtype or torch.float32)
        ys = torch.linspace(0, height - 1, height, dtype=dtype or torch.float32)
        if normalized_coordinates:
            xs = (xs / (width - 1) - 0.5) * 2
            ys = (ys / (height - 1) - 0.5) * 2
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], -1)[None]

    _kornia = types.ModuleType("kornia")
    _kornia.create_meshgrid = _create_meshgrid
    sys.modules["kornia"] = _kornia

from networks.renderer import NeRFAll  # noqa: E402
from networks.pdrf.blurmodel import BlurModel  # noqa: E402
from networks.dpnerf.blurmodel import RigidBlurringModel  # noqa: E402
from networks.dpnerf.awp import AdaptiveWeightProposal  # noqa: E402
from networks.embedding import ViewEmbedding, get_embedder  # noqa: E402
from networks.tonemapping import TonemappingTransform  # noqa: E402
from utils.rays import sample_pdf as ref_sample_pdf  # noqa: E402
from utils.events import egm_loss as ref_egm_loss  # noqa: E402

import oracle_common as oc  # noqa: E402


def T(a):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def kp(*parts):
    return "".join(f"[{p!r}]" for p in parts)


class Flat:
    """Flat param dict with access tracking (so nothing silently unmapped)."""

    def __init__(self, flat):
        self.flat = flat
        self.used = set()

    def __call__(self, *parts):
        key = kp(*parts)
        self.used.add(key)
        # copy: transplants that need no transpose hand this straight to
        # torch.from_numpy, which SHARES memory — a torch optimizer step
        # would then silently train the recorded init arrays in place
        # (this corrupted the lockstep goldens' init/ entries once)
        return np.array(self.flat[key])

    def unused(self, prefix="['params']"):
        return [k for k in self.flat if k.startswith(prefix)
                and k not in self.used]


# ---------------------------------------------------------------------------
# transplants (flax tree -> reference torch modules)
#
# every loader also registers the inverse transform torch-grad -> flax-grad
# in GRAD_REG, so the gradient-parity oracle can read back d loss/d param in
# flax layout after loss.backward()
# ---------------------------------------------------------------------------

GRAD_REG = {}


def _reg(parts, param, inv):
    GRAD_REG[kp(*parts)] = (param, inv)


def load_linear(lin, flat, *parts):
    lin.weight.data = T(flat(*parts, "kernel")).t().contiguous()
    _reg(parts + ("kernel",), lin.weight, lambda g: g.t())
    if lin.bias is not None:
        lin.bias.data = T(flat(*parts, "bias"))
        _reg(parts + ("bias",), lin.bias, lambda g: g)


def load_voxnerf(tm, flat, stage):
    base = ("params", "renderer", stage)
    for i in range(3):
        tm.app_plane[i].data = T(flat(*base, f"app_plane_{i}"))[None]
        _reg(base + (f"app_plane_{i}",), tm.app_plane[i], lambda g: g[0])
        tm.app_line[i].data = T(flat(*base, f"app_line_{i}"))[None, ..., None]
        _reg(base + (f"app_line_{i}",), tm.app_line[i],
             lambda g: g[0, ..., 0])
    load_linear(tm.basis_mat, flat, *base, "basis_mat")
    for l, lin in enumerate(tm.sigma_net):
        load_linear(lin, flat, *base, f"sigma_net_{l}")
    for l, lin in enumerate(tm.color_net):
        load_linear(lin, flat, *base, f"color_net_{l}")


def load_view_embed(tm, flat):
    tm.img_embed.data = T(flat("params", "view_embed", "img_embed"))
    _reg(("params", "view_embed", "img_embed"), tm.img_embed, lambda g: g)


def load_rbk(tm, flat):
    load_view_embed(tm.view_embed_module, flat)
    base = ("params", "kernelnet")
    for name in ("r", "v", "w"):
        branch = getattr(tm, f"{name}_branch")
        for i, lin in enumerate(branch):
            load_linear(lin, flat, *base, f"{name}_branch_{i}")
        load_linear(getattr(tm, f"{name}_linear"), flat, *base,
                    f"{name}_linear")


def load_dsk(tm, flat):
    load_view_embed(tm.img_embed, flat)
    base = ("params", "kernelnet")
    tm.pattern_pos.data = T(flat(*base, "pattern_pos"))
    _reg(base + ("pattern_pos",), tm.pattern_pos, lambda g: g)
    # reference Sequential puts Linears at even indices (blurmodel.py:96-107)
    linear_idx = [i for i, m in enumerate(tm.linears)
                  if isinstance(m, torch.nn.Linear)]
    for j, i in enumerate(linear_idx):
        load_linear(tm.linears[i], flat, *base, f"linears_{j}")
    load_linear(tm.linears1[0], flat, *base, "linears1_0")
    load_linear(tm.linears1[2], flat, *base, "linears1_1")


def load_conv1d(conv, flat, *parts):
    # flax channels-last Dense kernel [in, out] -> Conv1d weight [out, in, 1]
    conv.weight.data = T(flat(*parts, "kernel")).t()[..., None].contiguous()
    _reg(parts + ("kernel",), conv.weight, lambda g: g[..., 0].t())


def load_awp(tm, flat):
    base = ("params", "awpnet")
    for i, lin in enumerate(tm.sample_feature_embed_layer):
        load_linear(lin, flat, *base, f"sample_feature_embed_{i}")
    for i, lin in enumerate(tm.motion_feature_embed_layer):
        load_linear(lin, flat, *base, f"motion_feature_embed_{i}")
    load_linear(tm.w_linear, flat, *base, "w_linear")
    load_linear(tm.MAM.linear, flat, *base, "MAM", "linear")
    corr = tm.MAM.Corr
    cbase = base + ("MAM", "Corr")
    for name in ("conva", "convb", "convc", "convn", "convl"):
        load_conv1d(getattr(corr, name), flat, *cbase, name)
    corr.line_conv_att.weight.data = \
        T(flat(*cbase, "line_conv_att", "kernel")).t()[..., None, None].contiguous()
    _reg(cbase + ("line_conv_att", "kernel"), corr.line_conv_att.weight,
         lambda g: g[:, :, 0, 0].t())
    load_conv1d(corr.convd[0], flat, *cbase, "convd")
    corr.convd[1].weight.data = T(flat(*cbase, "convd_bn", "scale"))
    _reg(cbase + ("convd_bn", "scale"), corr.convd[1].weight, lambda g: g)
    corr.convd[1].bias.data = T(flat(*cbase, "convd_bn", "bias"))
    _reg(cbase + ("convd_bn", "bias"), corr.convd[1].bias, lambda g: g)
    # running stats stay at torch defaults (mean 0 / var 1) == flax init;
    # train-mode BatchNorm normalizes by BATCH stats so outputs don't
    # depend on them anyway


# ---------------------------------------------------------------------------
# reference model assembly per variant
# ---------------------------------------------------------------------------

class ArgsNS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def load_nerfmlp(tm, flat, stage):
    base = ("params", "renderer", stage)
    for i, lin in enumerate(tm.pts_linears):
        load_linear(lin, flat, *base, f"pts_linear_{i}")
    load_linear(tm.views_linears[0], flat, *base, "views_linear_0")
    load_linear(tm.feature_linear, flat, *base, "feature_linear")
    load_linear(tm.alpha_linear, flat, *base, "alpha_linear")
    load_linear(tm.rgb_linear, flat, *base, "rgb_linear")


def build_reference(name, flat):
    ov = oc.VARIANTS[name]
    kernel_type = ov["kernel_type"]
    use_awp = ov.get("kernel_use_awp", False)

    args = ArgsNS(
        mode=ov.get("mode", "c2f"),
        netdepth=ov.get("netdepth", 8), netwidth=ov.get("netwidth", 256),
        netdepth_fine=ov.get("netdepth_fine", 8),
        netwidth_fine=ov.get("netwidth_fine", 256),
        use_viewdirs=True, multires=4, multires_views=2,
        N_importance=oc.N_IMPORTANCE, kernel_type=kernel_type,
        kernel_use_awp=use_awp,
        bounding_box=(torch.tensor(oc.AABB[0]), torch.tensor(oc.AABB[1])),
        coarse_num_layers=2, coarse_hidden_dim=8, kernel_feat_cnl=15,
        coarse_num_layers_color=3, coarse_hidden_dim_color=8,
        rgb_add_bias=ov.get("rgb_add_bias", False),
        coarse_app_dim=8, coarse_app_n_comp=[4, 2, 2],
        coarse_n_voxels=4096, render_rmnearplane=0, coarse_app_actfn="none",
        fine_num_layers=2, fine_hidden_dim=8, fine_geo_feat_dim=8,
        fine_num_layers_color=3, fine_hidden_dim_color=8, fine_app_dim=8,
        fine_app_n_comp=[4, 2, 2], fine_n_voxels=8192, fine_app_actfn="none",
        rgb_activate="sigmoid", sigma_activate="relu",
    )

    view_embed = ViewEmbedding(num_embed=oc.NUM_IMAGES, embed_dim=8,
                               init_params="zero")
    if kernel_type == "RBK":
        kernelnet = RigidBlurringModel(
            feat_ch=0, num_motion=ov["kernel_ptnum"] - 1,
            D_r=1, W_r=32, D_v=1, W_v=32, D_w=1, W_w=32,
            output_ch_r=3, output_ch_v=3, rv_window=0.2,
            use_origin=True, view_embed=view_embed, W=8)
        load_rbk(kernelnet, flat)
    else:
        kernelnet = BlurModel(
            oc.NUM_IMAGES, ov["kernel_ptnum"], 10, kernel_type,
            img_wh=[oc.W, oc.H], random_hwindow=0.0, in_embed=3,
            random_mode="input",
            spatial_embed=ov.get("kernel_spatial_embed", 0), depth_embed=0,
            num_hidden=3, num_wide=64, feat_cnl=15, short_cut=False,
            pattern_init_radius=0.1, isglobal=False, optim_trans=False,
            optim_spatialvariant_trans=False, view_embed_cnl=8,
            view_embed=view_embed)
        load_dsk(kernelnet, flat)

    awpnet = None
    if use_awp:
        awpnet = AdaptiveWeightProposal(
            input_ch=8, num_motion=ov["kernel_ptnum"] - 1, use_origin=True,
            D_sam=2, W_sam=64, D_mot=1, W_mot=32,
            dir_freq=2, rgb_freq=2, depth_freq=3, ray_dir_freq=2,
            view_feature_ch=8)
        load_awp(awpnet, flat)

    nerf = NeRFAll(args, kernelnet, awpnet)
    if args.mode == "c2f":
        load_voxnerf(nerf.mlp_coarse, flat, "mlp_coarse")
        load_voxnerf(nerf.mlp_fine, flat, "mlp_fine")
    else:
        load_nerfmlp(nerf.mlp_coarse, flat, "mlp_coarse")
        load_nerfmlp(nerf.mlp_fine, flat, "mlp_fine")
    return nerf


def run_reference(name, flat):
    nerf = build_reference(name, flat)
    rays, rays_info = oc.make_inputs()
    rays_t = T(rays)
    ri = {
        "rays_x": T(rays_info["rays_x"])[:, None],
        "rays_y": T(rays_info["rays_y"])[:, None],
        "images_idx": torch.from_numpy(
            rays_info["images_idx"].astype(np.int64))[:, None],
        "poses": T(rays_info["poses"]),
    }
    K_t = torch.tensor(oc.K, dtype=torch.float32)
    render_kwargs = dict(N_samples=oc.N_SAMPLES, N_importance=oc.N_IMPORTANCE,
                         perturb=0.0, raw_noise_std=0.0, ndc=True,
                         near=0.0, far=1.0, use_viewdirs=True, retraw=False)

    nerf.train()
    with torch.no_grad():
        rgb, rgb1, other_loss, other_tensors = nerf(
            oc.H, oc.W, K_t, chunk=1 << 20, rays=rays_t, rays_info=ri,
            force_naive=False, return_pts0_rgb=True, **render_kwargs)

    rec = {"rgb": rgb}
    if rgb1 is not None:
        rec["rgb1"] = rgb1
    for k, v in other_loss.items():
        rec[f"loss/{k}"] = v
    for k in ("rgb_awp", "stage0_rgb_pts0", "stage1_rgb_pts0",
              "stage1_rgb1_pts0"):
        if other_tensors.get(k) is not None:
            rec[f"tensor/{k}"] = other_tensors[k]

    nerf.eval()
    with torch.no_grad():
        e_rgb, e_depth, e_acc, extras = nerf.render(
            oc.H, oc.W, K_t, 1 << 20, rays=rays_t, **render_kwargs)
    rec["eval/rgb_map"] = e_rgb
    rec["eval/depth_map"] = e_depth
    rec["eval/acc_map"] = e_acc
    if "rgb0" in extras:
        rec["eval/rgb0"] = extras["rgb0"]
    return {k: np.asarray(v.detach()) for k, v in rec.items()}


def run_reference_grads(name, flat):
    """d(mean((rgb-target)^2) + TV + align)/d params through the reference's
    autograd, read back in flax layout via GRAD_REG."""
    GRAD_REG.clear()
    nerf = build_reference(name, flat)
    rays, rays_info = oc.make_inputs()
    rays_t = T(rays)
    ri = {
        "rays_x": T(rays_info["rays_x"])[:, None],
        "rays_y": T(rays_info["rays_y"])[:, None],
        "images_idx": torch.from_numpy(
            rays_info["images_idx"].astype(np.int64))[:, None],
        "poses": T(rays_info["poses"]),
    }
    K_t = torch.tensor(oc.K, dtype=torch.float32)
    target = T(oc.make_grad_target())

    nerf.train()
    rgb, rgb1, other_loss, _ = nerf(
        oc.H, oc.W, K_t, chunk=1 << 20, rays=rays_t, rays_info=ri,
        force_naive=False, return_pts0_rgb=True,
        N_samples=oc.N_SAMPLES, N_importance=oc.N_IMPORTANCE,
        perturb=0.0, raw_noise_std=0.0, ndc=True, near=0.0, far=1.0,
        use_viewdirs=True, retraw=False)
    loss = ((rgb - target) ** 2).mean()
    for v in other_loss.values():
        loss = loss + v.sum()
    loss.backward()

    grads = {}
    for key, (p, inv) in GRAD_REG.items():
        if p.grad is None:
            grads[key] = np.zeros_like(np.asarray(inv(p.data)))
        else:
            grads[key] = np.asarray(inv(p.grad).detach())
    return grads


def compare_grads(name, ref, mine):
    """Scale-aware comparison (cancelling f32 sums differ in low bits)."""
    worst = 0.0
    assert set(ref) == set(mine), (
        sorted(set(ref) ^ set(mine)))
    for k in sorted(ref):
        scale = max(float(np.max(np.abs(ref[k]))), 1e-6)
        d = float(np.max(np.abs(ref[k] - mine[k]))) / scale
        worst = max(worst, d)
        status = "OK" if d < 5e-4 else "MISMATCH"
        print(f"  grad[{name}]{k}: rel|d|={d:.3e} {status}")
    return worst


# ---------------------------------------------------------------------------
# component oracles
# ---------------------------------------------------------------------------

def run_reference_crf(flat):
    crf = TonemappingTransform(map_type_rgb="gamma", map_type_event="learn",
                               gamma=2.2, luma_standard="rec601",
                               init_learn_identity=False,
                               extra_features_event=2)
    lin = crf.tonemapping_event.linear
    base = ("params", "tonemapping_event")
    for j, i in enumerate([0, 2, 4, 6]):
        load_linear(lin[i], flat, *base, f"linear_{j}")

    x, bii_feat = oc.make_crf_inputs()
    x_t, f_t = T(x), T(bii_feat)
    with torch.no_grad():
        rec = {
            "encode_rgb": crf.encode_rgb(x_t),
            "encode_luma": crf.encode_luma(x_t, ev_extra_feat=f_t),
            "encode_luma_nofeat": crf.encode_luma(x_t),
            "encode_luma_tonemap_only": crf.encode_luma(
                x_t, ev_extra_feat=f_t, tonemap_only=True),
            "encode_luma_skip": crf.encode_luma(x_t, skip_learn_crf=True),
        }
    return {k: np.asarray(v) for k, v in rec.items()}


def run_reference_egm():
    ls, le, bii, mask, cw, ms, me = oc.make_egm_inputs()
    with torch.no_grad():
        rec = {
            "mono": ref_egm_loss(T(ms), T(me), T(bii)),
            "color": ref_egm_loss(T(ls), T(le), T(bii),
                                  color_mask=torch.from_numpy(mask)),
            "color_weighted": ref_egm_loss(
                T(ls), T(le), T(bii), color_mask=torch.from_numpy(mask),
                color_weight=T(cw)),
        }
    return {k: np.asarray(v) for k, v in rec.items()}


def run_reference_pdf():
    bins, weights = oc.make_pdf_inputs()
    with torch.no_grad():
        out = ref_sample_pdf(T(bins), T(weights), 5, det=True)
    return {"det": np.asarray(out)}


def check_embedder():
    """One-off: the frequency embedders agree bit-for-bit."""
    from evdeblurnerf_tpu.models.embedding import positional_encoding

    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 3)).astype(np.float32)
    fn, ch = get_embedder(4)
    ref = np.asarray(fn(T(x)))
    mine = np.asarray(positional_encoding(x, 4))
    assert ref.shape[-1] == ch == mine.shape[-1]
    np.testing.assert_allclose(mine, ref, atol=1e-6)
    print("embedder parity OK")


def compare(name, ref, mine, atol=2e-5, rtol=2e-5):
    keys_r, keys_m = set(ref), set(mine)
    worst = 0.0
    for k in sorted(keys_r & keys_m):
        d = float(np.max(np.abs(ref[k] - mine[k]))) if ref[k].size else 0.0
        worst = max(worst, d)
        status = "OK" if np.allclose(mine[k], ref[k], atol=atol,
                                     rtol=rtol) else "MISMATCH"
        print(f"  {name}/{k}: max|d|={d:.3e} {status}")
    if keys_r ^ keys_m:
        print(f"  {name}: key mismatch ref-only={keys_r - keys_m} "
              f"jax-only={keys_m - keys_r}")
    return worst


def main():
    torch.set_default_dtype(torch.float32)
    torch.manual_seed(0)
    os.makedirs(oc.GOLDEN_DIR, exist_ok=True)
    check_embedder()

    failures = []
    for name in sorted(oc.VARIANTS):
        _, variables = oc.init_variant(name)
        flat_np = oc.flatten(variables)
        flat = Flat(flat_np)
        ref = run_reference(name, flat)
        unused = flat.unused()
        if unused:
            raise RuntimeError(f"{name}: unmapped params: {unused}")
        mine = oc.run_jax(name, variables)
        worst = compare(name, ref, mine)
        if worst > 1e-3:
            failures.append((name, worst))
        ref_grads = run_reference_grads(name, Flat(flat_np))
        mine_grads = oc.run_jax_grads(name, variables)
        gworst = compare_grads(name, ref_grads, mine_grads)
        if gworst > 5e-3:
            failures.append((name + "/grads", gworst))
        payload = {f"var/{k}": v for k, v in flat_np.items()}
        payload.update({f"out/{k}": v for k, v in ref.items()})
        payload.update({f"grad/{k}": v for k, v in ref_grads.items()})
        np.savez(oc.oracle_path(name), **payload)
        print(f"wrote {oc.oracle_path(name)}")

    # components
    crf = oc.build_crf()
    x, _ = oc.make_crf_inputs()
    params = crf.init(jax.random.PRNGKey(9), x, mode="init_all")
    flat_np = oc.flatten(params)
    ref_crf = run_reference_crf(Flat(flat_np))
    compare("crf", ref_crf, oc.run_jax_crf(params))
    ref_egm = run_reference_egm()
    compare("egm", ref_egm, oc.run_jax_egm())
    ref_pdf = run_reference_pdf()
    compare("pdf", ref_pdf, oc.run_jax_pdf())
    payload = {f"var/{k}": v for k, v in flat_np.items()}
    payload.update({f"crf/{k}": v for k, v in ref_crf.items()})
    payload.update({f"egm/{k}": v for k, v in ref_egm.items()})
    payload.update({f"pdf/{k}": v for k, v in ref_pdf.items()})
    np.savez(os.path.join(oc.GOLDEN_DIR, "oracle_components.npz"), **payload)
    print("wrote oracle_components.npz")

    if failures:
        raise SystemExit(f"PARITY FAILURES: {failures}")
    print("all oracle fixtures verified against the live reference")


if __name__ == "__main__":
    main()
