"""End-to-end run of the reference-checkpoint interop TOOLS.

tools/export_reference_checkpoint.py and
tools/convert_reference_checkpoint.py each rebuild a checkpoint
restore/save template; it must be built exactly as training builds it
(train/loop.py::build_initial_state) — ``--colornet_weightdecay``
prepends ``optax.add_decayed_weights`` and changes the opt_state tree
structure, which regressed once in serving export (tests/test_export.py)
and once in both tools (hand-rolled plain-optimizer templates). This
test trains WITH weight decay (and events, so the tools' events-off
dataset shortcut is exercised), exports to the reference *.tar format,
converts back, and asserts the round-tripped checkpoint restores
bit-exactly through training's own template.
"""

import copy
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

from synthetic import make_synthetic_scene  # noqa: E402
from test_train import tiny_args  # noqa: E402


def test_tar_roundtrip_with_colornet_weightdecay(tmp_path, monkeypatch):
    pytest.importorskip("torch")
    import jax

    from evdeblurnerf_tpu import config
    from evdeblurnerf_tpu.train.checkpoint import CheckpointManager
    from evdeblurnerf_tpu.train.loop import (build_datasets,
                                             build_initial_state,
                                             build_model, train)

    scene_dir = str(tmp_path / "scene")
    os.makedirs(scene_dir)
    make_synthetic_scene(scene_dir)
    logdir = str(tmp_path / "logs")
    args = tiny_args(
        scene_dir, logdir, expname="interop",
        N_iters=6, i_weights=10 ** 9, i_testset=10 ** 9, i_print=2,
        colornet_weightdecay=1e-4,           # 3-element optax chain
        use_events=True, add_event_egm=True, events_N_rand=64,
        add_event_egm_stages=["stage0", "stage1"],
        tone_mapping_events_type="learn",
        tone_mapping_learn_init_identity=True,
        tone_mapping_events_add_bii="pos-neg",
        event_accumulate_step_range=[1, 3],
        event_accumulate_step_range_end=[1, 3],
    )
    state = train(copy.deepcopy(args))
    assert int(state.step) == 6
    ckpt_dir = os.path.join(logdir, "interop", "checkpoints")
    assert os.path.isdir(ckpt_dir)

    # the tools parse the experiment config from CLI; feed them the same
    # args namespace directly (flag parsing is covered by test_config)
    monkeypatch.setattr(config, "parse_args",
                        lambda rest=None: copy.deepcopy(args))

    import convert_reference_checkpoint as cv
    import export_reference_checkpoint as ex

    tar = str(tmp_path / "step6.tar")
    monkeypatch.setattr(sys, "argv",
                        ["export_reference_checkpoint.py", "--out", tar,
                         "--ckpt", ckpt_dir])
    ex.main()
    assert os.path.exists(tar)

    converted = str(tmp_path / "converted_ckpt")
    monkeypatch.setattr(sys, "argv",
                        ["convert_reference_checkpoint.py", "--ref_ckpt",
                         tar, "--out", converted])
    cv.main()

    # restore the converted checkpoint through TRAINING's own template
    # (the exact path `run_nerf.py --ft_path <out>` takes)
    dargs = copy.copy(copy.deepcopy(args))
    dargs.use_events = False
    llff, _ = build_datasets(dargs)
    _, _, model, crf = build_model(args, llff)
    template, _ = build_initial_state(copy.deepcopy(args), llff, model, crf,
                                      crf_identity_prefit=False)
    mngr = CheckpointManager(converted)
    restored = mngr.restore_latest(template)
    mngr.close()
    assert restored is not None, "converted checkpoint not restorable"
    step, rstate = int(restored[0]), restored[1]
    assert step == 6

    want = jax.tree_util.tree_leaves(jax.device_get(state.params))
    got = jax.tree_util.tree_leaves(jax.device_get(rstate.params))
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
