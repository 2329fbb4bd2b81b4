import os

import pytest

from evdeblurnerf_tpu import config


REFERENCE_CONFIG = """\
num_gpu = 1
expname = blender_test
basedir = logs
datadir = datasets/scene
tbdir = tb
dataset_type = llff
seed = 10000
factor = 1
llffhold = 8
use_pts0_prior = edi
pts0_target_weight = 0.01
pts0_target_weight_scheduler = cosine
tone_mapping_events_add_bii='pos-neg'
tone_mapping_learn_init_identity = True
events_N_rand 4096
events_tms_unit = 'ns'
use_events
event_accumulate_step_range = [0, 0]
add_event_egm_stages = [stage0, stage1]
event_egm_weight = 0.1
N_rand = 1024
lrate = 0.005
use_viewdirs = True
raw_noise_std = 1e0
mode = c2f
coarse_app_n_comp = [64,16,16]
kernel_type = RBK
kernel_ptnum = 10
kernel_rand_embed = 2  # inline comment
kernel_rbk_use_origin
tone_mapping_type gamma
event_egm_use_color_weights = [0.4, 0.2, 0.4]
"""


@pytest.fixture
def cfg_file(tmp_path):
    path = tmp_path / "exp.txt"
    path.write_text(REFERENCE_CONFIG)
    return str(path)


def test_parse_reference_style_config(cfg_file):
    args = config.parse_args(["--config", cfg_file])
    assert args.expname == "blender_test"
    assert args.seed == 10000
    assert args.use_pts0_prior == "edi"
    assert args.pts0_target_weight == 0.01
    assert args.pts0_target_weight_scheduler == "cosine"
    assert args.tone_mapping_events_add_bii == "pos-neg"
    assert args.tone_mapping_learn_init_identity is True
    assert args.events_N_rand == 4096
    assert args.events_tms_unit == "ns"
    assert args.use_events is True
    assert args.event_accumulate_step_range == [0, 0]
    assert args.add_event_egm_stages == ["stage0", "stage1"]
    assert args.N_rand == 1024
    assert args.lrate == 0.005
    assert args.use_viewdirs is True
    assert args.raw_noise_std == 1.0
    assert args.coarse_app_n_comp == [64, 16, 16]
    assert args.kernel_type == "RBK"
    assert args.kernel_rand_embed == 2  # inline comment stripped
    assert args.kernel_rbk_use_origin is True
    assert args.tone_mapping_type == "gamma"
    assert args.event_egm_use_color_weights == [0.4, 0.2, 0.4]
    # untouched defaults
    assert args.N_iters == 50000
    assert args.kernel_hwindow == 10


def test_cli_overrides_config(cfg_file):
    args = config.parse_args(["--config", cfg_file, "--N_rand", "64",
                              "--render_only", "--factor", "4"])
    assert args.N_rand == 64
    assert args.render_only is True
    assert args.factor == 4
    assert args.expname == "blender_test"


def test_real_reference_configs_parse():
    ref_cfg_dir = "/root/reference/configs"
    if not os.path.isdir(ref_cfg_dir):
        pytest.skip("reference configs unavailable")
    n = 0
    for root, _, files in os.walk(ref_cfg_dir):
        for fname in files:
            if fname.endswith(".txt"):
                args = config.parse_args(
                    ["--config", os.path.join(root, fname)])
                assert args.mode in ("c2f", "nerf")
                assert args.N_rand > 0
                n += 1
    assert n >= 13


def test_default_args_and_unknown_flag():
    args = config.default_args(N_rand=128)
    assert args.N_rand == 128
    with pytest.raises(ValueError):
        config.default_args(not_a_flag=1)


def test_egm_stage_names_validated():
    """A typo'd --add_event_egm_stages value must fail at parse time, not
    silently zero the event loss (the step gates on exact membership, like
    ref run_nerf.py:561-565)."""
    args = config.default_args(add_event_egm_stages=["stage0", "stage1"])
    assert tuple(args.add_event_egm_stages) == ("stage0", "stage1")
    with pytest.raises(ValueError, match="add_event_egm_stages"):
        config.default_args(add_event_egm_stages=["stage_1"])


def test_grad_accum_must_divide_batch():
    """N_rand not divisible by grad_accum is a config error with a clear
    message (the jitted step reshapes into equal microbatches)."""
    with pytest.raises(ValueError, match="grad_accum"):
        config.default_args(N_rand=129, grad_accum=2)
