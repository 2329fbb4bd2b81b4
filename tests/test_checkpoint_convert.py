"""Reference-checkpoint conversion round-trip against recorded state dicts.

tests/goldens/oracle_convert.npz holds, per oracle variant, the ACTUAL
reference modules' ``state_dict()`` (torch layout, exactly what
run_nerf.py:617-638 checkpoints) carrying weights transplanted from a
seeded flax tree — generated and live-verified by
tools/make_convert_oracle_fixture.py. These tests replay
evdeblurnerf_tpu.utils.checkpoint_convert on the recorded dicts and
assert it reproduces the flax tree EXACTLY, and that the converted CRF
head reproduces the recorded torch forward.
"""

import os

import numpy as np
import pytest

import oracle_common as oc
from evdeblurnerf_tpu.utils import checkpoint_convert as cc

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "oracle_convert.npz")


@pytest.fixture(scope="module")
def ora():
    assert os.path.exists(GOLDEN), (
        "oracle_convert.npz missing; regenerate with "
        "python tools/make_convert_oracle_fixture.py")
    data = np.load(GOLDEN)
    return {k: data[k] for k in data.files}


def group(ora, prefix):
    return {k[len(prefix):]: v for k, v in ora.items()
            if k.startswith(prefix)}


@pytest.mark.parametrize("name", sorted(oc.VARIANTS))
def test_network_conversion_roundtrip(ora, name):
    sd = group(ora, f"net_{name}/")
    expect = group(ora, f"exp_{name}/")
    params, stats = cc.convert_network_state_dict(sd)
    got = dict(params, **stats)
    assert sorted(got) == sorted(expect), (
        set(got) ^ set(expect))
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k], err_msg=k)


@pytest.mark.parametrize("name", sorted(oc.VARIANTS))
def test_merge_into_model_variables(ora, name):
    sd = group(ora, f"net_{name}/")
    params, stats = cc.convert_network_state_dict(sd)
    _, variables = oc.init_variant(name)
    merged, untouched = cc.merge_into_variables(
        variables, dict(params, **stats), label=name)
    assert not untouched
    flat = oc.flatten(merged)
    expect = group(ora, f"exp_{name}/")
    for k in expect:
        np.testing.assert_array_equal(flat[k], expect[k], err_msg=k)


def test_shape_mismatch_is_loud(ora):
    name = sorted(oc.VARIANTS)[0]
    sd = group(ora, f"net_{name}/")
    params, stats = cc.convert_network_state_dict(sd)
    _, variables = oc.init_variant(name)
    key = next(iter(params))
    params[key] = params[key][..., :1]
    with pytest.raises(cc.UnmappedKeysError, match="shape mismatch"):
        cc.merge_into_variables(variables, dict(params, **stats))


def test_unknown_keys_are_loud(ora):
    name = sorted(oc.VARIANTS)[0]
    sd = group(ora, f"net_{name}/")
    sd["network_fn_state_dict.some.legacy.key"] = np.zeros(3)
    with pytest.raises(cc.UnmappedKeysError, match="unrecognized"):
        cc.convert_network_state_dict(sd)


# keys the reference module owns but never uses in forward; the exporter
# synthesizes them (shape/dtype must match, values need not)
SYNTHESIZED = ("awpnet.MAM.conv.", "num_batches_tracked")

# config corners the recorded oracles don't cover: the export->convert pair
# must still be mutually inverse (torch-free; reference-key agreement for
# the shared structures is pinned by the recorded-oracle tests above)
EXTRA_VARIANTS = {
    "rbk_mlp_embed": dict(kernel_type="RBK", kernel_ptnum=4,
                          kernel_rbk_use_origin=True,
                          kernel_img_embed_type="param_mlp",
                          kernel_img_mlp_depth=3, kernel_img_mlp_embed=8),
    "rbk_no_awp": dict(kernel_type="RBK", kernel_ptnum=3,
                       kernel_rbk_use_origin=True, kernel_use_awp=False),
    "dsk_deep": dict(kernel_type="DSK", kernel_ptnum=3,
                     kernel_spatial_embed=2, kernel_spatialvariant_trans=True,
                     kernel_num_hidden=4),
}


@pytest.mark.parametrize("name", sorted(EXTRA_VARIANTS))
def test_export_convert_inverse_on_extra_configs(name):
    import jax

    from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                                kernel_config_from_args)

    args = oc.make_args(EXTRA_VARIANTS[name])
    cfg = oc.make_cfg(args)
    kcfg = kernel_config_from_args(args)
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=oc.NUM_IMAGES,
                         K=oc.K)
    rays, rays_info = oc.make_inputs()
    variables = dict(model.init(jax.random.PRNGKey(5), jax.random.PRNGKey(6),
                                rays, rays_info, force_naive=False,
                                return_pts0_rgb=True))
    sd = cc.export_network_state_dict(variables)
    params, stats = cc.convert_network_state_dict(sd)
    merged, untouched = cc.merge_into_variables(
        variables, dict(params, **stats), label=name)
    assert not untouched
    flat0 = oc.flatten(variables)
    for k, v in oc.flatten(merged).items():
        np.testing.assert_array_equal(v, flat0[k], err_msg=k)


@pytest.mark.parametrize("name", sorted(oc.VARIANTS))
def test_export_reproduces_reference_state_dict(ora, name):
    """convert -> merge -> export reproduces the recorded reference
    network_state_dict key-for-key (exact values for live weights,
    shape/dtype for dead/bookkeeping ones)."""
    sd = group(ora, f"net_{name}/")
    params, stats = cc.convert_network_state_dict(sd)
    _, variables = oc.init_variant(name)
    merged, _ = cc.merge_into_variables(
        variables, dict(params, **stats), label=name)
    out = cc.export_network_state_dict(merged)

    # the recording drops nothing: every reference key must come back
    assert sorted(out) == sorted(sd), (set(out) ^ set(sd))
    for k in sd:
        assert out[k].shape == sd[k].shape, k
        if any(s in k for s in SYNTHESIZED):
            assert out[k].dtype == sd[k].dtype, k
        else:
            np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_export_crf_roundtrip(ora):
    crf_sd = group(ora, "crf_sd/")
    flat = cc.convert_crf_state_dict(crf_sd)

    import jax

    crf = oc.build_crf()
    template = dict(crf.init(jax.random.PRNGKey(3), np.zeros((4, 3)),
                             mode="init_all"))
    merged, _ = cc.merge_into_variables(template, flat, label="crf")
    out = cc.export_crf_state_dict(merged["params"])
    assert sorted(out) == sorted(crf_sd), (set(out) ^ set(crf_sd))
    for k in crf_sd:
        np.testing.assert_array_equal(out[k], crf_sd[k], err_msg=k)


def test_legacy_two_network_checkpoint_migrates(ora):
    """deblur-nerf/DP-NeRF era checkpoints carry the two bare MLPs as
    network_fn/fine_state_dict (some with DataParallel 'module.'
    prefixes); normalization + conversion must land them on the same
    leaves as a modern checkpoint's mlp_coarse./mlp_fine. keys."""
    sd = group(ora, "net_nerf_rbk/")
    fn = {k[len("mlp_coarse."):]: v for k, v in sd.items()
          if k.startswith("mlp_coarse.")}
    fine = {"module." + k[len("mlp_fine."):]: v for k, v in sd.items()
            if k.startswith("mlp_fine.")}
    assert fn and fine
    legacy = cc.normalize_legacy_network_state_dict(
        {"network_fn_state_dict": fn, "network_fine_state_dict": fine})
    params, stats = cc.convert_network_state_dict(legacy)
    assert not stats
    expect = {k: v for k, v in group(ora, "exp_nerf_rbk/").items()
              if "['renderer']" in k}
    assert sorted(dict(params)) == sorted(expect)
    for k in expect:
        np.testing.assert_array_equal(params[k], expect[k], err_msg=k)

    # non-legacy checkpoints pass through as None
    assert cc.normalize_legacy_network_state_dict(
        {"network_state_dict": sd}) is None


def test_crf_conversion_forward(ora):
    crf_sd = group(ora, "crf_sd/")
    flat = cc.convert_crf_state_dict(crf_sd)
    expect = group(ora, "crf_exp/")
    assert sorted(flat) == sorted(expect)
    for k in expect:
        np.testing.assert_array_equal(flat[k], expect[k], err_msg=k)

    import jax

    crf = oc.build_crf()
    template = dict(crf.init(jax.random.PRNGKey(3), np.zeros((4, 3)),
                             mode="init_all"))
    merged, _ = cc.merge_into_variables(template, flat, label="crf")
    out = crf.apply({"params": merged["params"]}, ora["crf_x"],
                    mode="encode_luma", ev_extra_feat=ora["crf_feat"])
    np.testing.assert_allclose(np.asarray(out), ora["crf_out"], atol=2e-6,
                               rtol=2e-6,
                               err_msg="converted CRF vs recorded torch")
