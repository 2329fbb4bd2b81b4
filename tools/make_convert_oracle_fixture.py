#!/usr/bin/env python
"""Generate checkpoint-converter round-trip fixtures.

For each oracle variant, transplants our (seeded random) flax parameters
into the ACTUAL reference modules (tools/make_reference_fixtures.py — the
mapping verified to ~1e-7 forward agreement against the live reference),
dumps the resulting reference ``state_dict()`` exactly as run_nerf.py
would checkpoint it, and records it next to the original flax tree.
tests/test_checkpoint_convert.py then asserts that
evdeblurnerf_tpu.utils.checkpoint_convert inverts the reference layout
back to the flax parameters EXACTLY — so a converted reference checkpoint
reproduces reference numerics by composition with the forward-parity
oracles.

Usage: JAX_PLATFORMS=cpu python tools/make_convert_oracle_fixture.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import make_reference_fixtures as mrf  # noqa: E402  (sets up all shims)
import oracle_common as oc  # noqa: E402

from evdeblurnerf_tpu.utils import checkpoint_convert as cc  # noqa: E402

GOLDEN = os.path.join(REPO, "tests", "goldens", "oracle_convert.npz")

payload = {}

for name in sorted(oc.VARIANTS):
    _, variables = oc.init_variant(name)
    flat = oc.flatten(variables)
    nerf = mrf.build_reference(name, mrf.Flat(flat))
    sd = {k: v.detach().cpu().numpy() for k, v in nerf.state_dict().items()}

    params, stats = cc.convert_network_state_dict(sd)
    expect = {k: v for k, v in flat.items()
              if not k.startswith("['params']['view_embed_crf']")}
    got = dict(params, **stats)
    missing = sorted(set(expect) - set(got))
    assert not missing, (name, "converter lost keys", missing)
    extra = sorted(set(got) - set(expect))
    assert not extra, (name, "converter invented keys", extra)
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k],
                                      err_msg=f"{name}: {k}")

    merged, untouched = cc.merge_into_variables(variables, got, label=name)
    assert not untouched, (name, untouched)
    for k, v in oc.flatten(merged).items():
        np.testing.assert_array_equal(v, flat[k], err_msg=f"{name}: {k}")

    # the exporter's output must strict-load into the LIVE reference module
    import torch as _torch

    exported = cc.export_network_state_dict(merged)
    nerf.load_state_dict({k: _torch.from_numpy(np.array(v, copy=True))
                          for k, v in exported.items()}, strict=True)

    for k, v in sd.items():
        payload[f"net_{name}/{k}"] = v
    for k, v in flat.items():
        payload[f"exp_{name}/{k}"] = v
    print(f"{name}: {len(sd)} reference keys -> {len(got)} flax leaves, "
          "round-trip exact; export strict-loads into the reference")

# CRF head (TonemappingTransform with a learned event head)
import torch  # noqa: E402
from networks.tonemapping import TonemappingTransform  # noqa: E402

crf_t = TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                             extra_features_event=2,
                             init_learn_identity=False)
crf_sd = {k: v.detach().cpu().numpy() for k, v in crf_t.state_dict().items()}
crf_flat = cc.convert_crf_state_dict(crf_sd)

import jax  # noqa: E402

crf_ours = oc.build_crf()
template = dict(crf_ours.init(jax.random.PRNGKey(3), np.zeros((4, 3)),
                              mode="init_all"))
merged, _ = cc.merge_into_variables(template, crf_flat, label="crf")
x, feat = oc.make_crf_inputs()
ours = crf_ours.apply({"params": merged["params"]}, np.asarray(x),
                      mode="encode_luma", ev_extra_feat=np.asarray(feat))
with torch.no_grad():
    ref = crf_t.encode_luma(torch.from_numpy(np.asarray(x, np.float32)),
                            ev_extra_feat=torch.from_numpy(
                                np.asarray(feat, np.float32)))
np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-6,
                           rtol=2e-6, err_msg="converted CRF forward")

for k, v in crf_sd.items():
    payload[f"crf_sd/{k}"] = v
for k, v in crf_flat.items():
    payload[f"crf_exp/{k}"] = v
payload["crf_x"] = np.asarray(x)
payload["crf_feat"] = np.asarray(feat)
payload["crf_out"] = ref.numpy()
print(f"crf: {len(crf_sd)} keys, converted forward matches torch")

np.savez_compressed(GOLDEN, **payload)
print(f"wrote {GOLDEN} ({os.path.getsize(GOLDEN) / 1024:.0f} KiB, "
      f"{len(payload)} arrays)")
