#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (*.tar) into this framework.

Takes the experiment config (the same config file the reference run used —
the flag surface is compatible) plus the reference checkpoint, and writes
an orbax checkpoint directory that ``run_nerf.py --ft_path <out>`` (or
auto-resume with ``--basedir/--expname`` pointed at it) restores: the full
network (tri-plane fields / NeRF MLPs, blur kernel, AWP+MAM incl. BatchNorm
running stats) and both CRF heads, at the reference run's global step.
Adam moments are not transferable across frameworks and restart fresh.

Reference checkpoint format: {global_step, network_state_dict,
crf_state_dict, optimizer_state_dict, wandb_id} (ref: run_nerf.py:617-638).
The name/layout mapping is the tested inverse of the parity-oracle
transplant (tests/test_checkpoint_convert.py: exact round-trip).

Usage:
  python tools/convert_reference_checkpoint.py \
      --config configs/<exp>.txt --ref_ckpt /path/030000.tar --out <dir>
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins the
# backend via jax.config (the env var alone is silently overridden there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref_ckpt", required=True,
                    help="reference *.tar checkpoint")
    ap.add_argument("--out", required=True,
                    help="output orbax checkpoint directory")
    ap.add_argument("--step", type=int, default=None,
                    help="override the restored global step")
    cli, rest = ap.parse_known_args()

    import torch

    from evdeblurnerf_tpu import config
    from evdeblurnerf_tpu.train.checkpoint import CheckpointManager
    from evdeblurnerf_tpu.train.loop import (build_datasets,
                                             build_initial_state, build_model)
    from evdeblurnerf_tpu.utils import checkpoint_convert as cc

    args = config.parse_args(rest)
    config.resolve_event_thresholds(args)

    ckpt = torch.load(cli.ref_ckpt, map_location="cpu", weights_only=False)
    legacy = cc.normalize_legacy_network_state_dict(ckpt)
    if legacy is not None:
        # deblur-nerf/DP-NeRF era checkpoint: two bare MLPs, no kernel/CRF
        print(f"legacy two-network checkpoint: migrated {len(legacy)} "
              "tensors to mlp_coarse./mlp_fine. (no kernel/CRF to restore)")
        ckpt["network_state_dict"] = legacy
        ckpt.setdefault("crf_state_dict", {})
    elif "network_state_dict" not in ckpt:
        raise SystemExit(
            f"{cli.ref_ckpt}: no 'network_state_dict' (and not a legacy "
            "two-network checkpoint)")
    step = cli.step if cli.step is not None else int(
        ckpt.get("global_step", 0))

    def _np(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    net_sd = {k: _np(v) for k, v in ckpt["network_state_dict"].items()}
    crf_sd = {k: _np(v) for k, v in ckpt.get("crf_state_dict", {}).items()}
    net_flat, stats_flat = cc.convert_network_state_dict(net_sd)
    crf_flat = cc.convert_crf_state_dict(crf_sd)
    print(f"converted {len(net_sd)} network + {len(crf_sd)} CRF tensors")

    # build the model + TrainState exactly as training would (incl. the
    # --colornet_weightdecay optimizer chain: the saved opt_state tree must
    # match training's restore template), then transplant. Only the frame
    # dataset is needed (camera/AABB) — skip replaying the event-stream
    # preprocessing + EDI prior an events config would otherwise pay here.
    import copy

    dargs = copy.copy(args)
    dargs.use_events = False
    llff, _ = build_datasets(dargs)
    _, _, model, crf = build_model(args, llff)
    state, _ = build_initial_state(args, llff, model, crf,
                                   crf_identity_prefit=False)

    nerf_vars = {"params": state.params["nerf"]}
    if state.batch_stats:
        nerf_vars["batch_stats"] = state.batch_stats
    nerf_vars, untouched = cc.merge_into_variables(
        nerf_vars, dict(net_flat, **stats_flat), label="network")
    if untouched:
        print(f"note: {len(untouched)} leaves keep fresh init (not in the "
              f"reference checkpoint): {untouched[:6]}"
              f"{' ...' if len(untouched) > 6 else ''}")
    crf_vars, _ = cc.merge_into_variables(
        {"params": state.params["crf"]}, crf_flat, label="crf")

    state = state.replace(
        step=np.int32(step),
        params={"nerf": nerf_vars["params"], "crf": crf_vars["params"]},
        batch_stats=nerf_vars.get("batch_stats", state.batch_stats))

    mngr = CheckpointManager(os.path.abspath(cli.out))
    mngr.save(step, state, force=True)
    mngr.close()
    print(f"wrote orbax checkpoint step {step} to {cli.out}; use "
          f"--ft_path {cli.out} (with --no_reload off) to load it")


if __name__ == "__main__":
    main()
