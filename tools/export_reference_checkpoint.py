#!/usr/bin/env python
"""Export one of this framework's checkpoints as a reference *.tar.

The inverse of tools/convert_reference_checkpoint.py: loads an orbax
checkpoint (auto-latest under --basedir/--expname, or an explicit
--ckpt directory) plus the experiment config, and writes a torch
checkpoint in the reference trainer's exact format —
``{wandb_id, global_step, crf_state_dict, network_state_dict,
optimizer_state_dict}`` (ref: run_nerf.py:617-638) — so a model trained
here can be reloaded, rendered, and fine-tuned by the reference via its
``--ft_path`` flow (strict ``load_state_dict``, ref: utils/misc.py:198-214).

Adam moments are not transferable across frameworks: the exported
optimizer state carries empty moments with param groups mirroring the
reference's construction (grad_vars / grad_vars_vol / crf — ref:
run_nerf.py:243-262, networks/renderer.py:60-79), which torch's
``Optimizer.load_state_dict`` accepts (group sizes must match) and then
accumulates fresh.

Usage:
  python tools/export_reference_checkpoint.py \
      --config configs/<exp>.txt --out /path/030000.tar \
      [--ckpt <orbax dir>]  # default: latest under basedir/expname
"""

import argparse
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-pins the
# backend via jax.config (the env var alone is silently overridden there)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _adam_groups(args, net_sd, crf_sd):
    """Param-group sizes mirroring the reference's optimizer construction
    (ref: run_nerf.py:243-262). Returns a list of per-group key lists."""
    is_param = lambda k: "running_" not in k and "num_batches_tracked" not in k
    net_keys = [k for k in net_sd if is_param(k)]
    crf_keys = [k for k in crf_sd if is_param(k)]
    vol = [k for k in net_keys
           if (".app_plane." in k or ".app_line." in k)]
    rest = [k for k in net_keys if k not in vol]
    if args.mode == "c2f":
        if args.colornet_weightdecay:
            wd = [k for k in rest
                  if re.search(r"\.color_net\.[0-9]+\.weight$", k)]
            nowd = [k for k in rest if k not in wd]
            groups = [(wd, args.colornet_weightdecay), (nowd, 0.0),
                      (vol, 0.0)]
        else:
            groups = [(rest, 0.0), (vol, 0.0)]
    else:
        groups = [(net_keys, 0.0)]
    groups.append((crf_keys, 0.0))
    return groups


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output *.tar path")
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (default: latest under "
                         "basedir/expname/checkpoints)")
    ap.add_argument("--wandb_id", default=None)
    cli, rest = ap.parse_known_args()

    import torch

    from evdeblurnerf_tpu import config
    from evdeblurnerf_tpu.train.checkpoint import CheckpointManager
    from evdeblurnerf_tpu.train.loop import (build_datasets,
                                             build_initial_state, build_model)
    from evdeblurnerf_tpu.utils import checkpoint_convert as cc

    args = config.parse_args(rest)
    config.resolve_event_thresholds(args)

    # restore template built exactly as training built it (incl. the
    # --colornet_weightdecay optimizer chain — the opt_state tree structure
    # must match or orbax restore fails); only the frame dataset is needed
    import copy

    dargs = copy.copy(args)
    dargs.use_events = False
    llff, _ = build_datasets(dargs)
    _, _, model, crf = build_model(args, llff)
    state, _ = build_initial_state(args, llff, model, crf,
                                   crf_identity_prefit=False)

    ckpt_dir = cli.ckpt or os.path.join(args.basedir, args.expname,
                                        "checkpoints")
    mngr = CheckpointManager(os.path.abspath(ckpt_dir))
    restored = mngr.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found under {ckpt_dir}")
    _, state = restored
    mngr.close()
    step = int(state.step)

    nerf_vars = {"params": state.params["nerf"]}
    if state.batch_stats:
        nerf_vars["batch_stats"] = state.batch_stats
    net_sd = cc.export_network_state_dict(nerf_vars)
    crf_sd = cc.export_crf_state_dict(state.params["crf"])
    print(f"exported {len(net_sd)} network + {len(crf_sd)} CRF tensors "
          f"at step {step}")

    groups = _adam_groups(args, net_sd, crf_sd)
    pid = iter(range(sum(len(g) for g, _ in groups)))
    param_groups = [{
        "lr": args.lrate, "betas": (0.9, 0.999), "eps": 1e-8,
        "weight_decay": wd, "amsgrad": False, "maximize": False,
        "foreach": None, "capturable": False, "differentiable": False,
        "fused": None, "initial_lr": args.lrate,
        "params": [next(pid) for _ in g],
    } for g, wd in groups]

    payload = {
        "wandb_id": cli.wandb_id,
        "global_step": step,
        "crf_state_dict": {k: torch.from_numpy(np.array(v, copy=True))
                           for k, v in crf_sd.items()},
        "network_state_dict": {k: torch.from_numpy(np.array(v, copy=True))
                               for k, v in net_sd.items()},
        "optimizer_state_dict": {"state": {}, "param_groups": param_groups},
    }
    os.makedirs(os.path.dirname(os.path.abspath(cli.out)), exist_ok=True)
    torch.save(payload, cli.out)
    print(f"wrote reference checkpoint {cli.out} (step {step}); load with "
          "the reference's --ft_path")


if __name__ == "__main__":
    main()
