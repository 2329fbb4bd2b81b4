"""Generated experiment configs resolve to the same flag values as the
upstream experiment spec (runs only where the reference checkout exists)."""

import glob
import os

import pytest

from evdeblurnerf_tpu import config as cfgmod

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_configs_value_identical():
    ref_paths = sorted(glob.glob(os.path.join(REF, "**", "*.txt"),
                                 recursive=True))
    assert len(ref_paths) == 13
    repo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    for ref_path in ref_paths:
        ours = ref_path.replace(REF, repo)
        assert os.path.exists(ours), ours
        a = cfgmod.parse_args(["--config", ref_path]).as_dict()
        b = cfgmod.parse_args(["--config", ours]).as_dict()
        diff = {k: (a[k], b[k]) for k in a
                if k != "config" and a[k] != b[k]}
        assert not diff, (ref_path, diff)


def test_all_repo_configs_parse():
    repo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    paths = sorted(glob.glob(os.path.join(repo, "**", "*.txt"),
                             recursive=True))
    assert len(paths) == 13
    for p in paths:
        args = cfgmod.parse_args(["--config", p])
        assert args.mode == "c2f"
        assert args.kernel_type == "RBK"
