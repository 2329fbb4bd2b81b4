"""LPIPS (v0.1, AlexNet trunk) in JAX.

Capability-parity counterpart of the reference's vendored LPIPS evaluator
(ref: networks/lpips/lpips.py:140, networks/lpips/pretrained_networks.py):
AlexNet feature taps -> channel-unit-normalize -> learned 1x1 linear heads
-> spatial average -> sum. Pure-functional jax; weights load from a single
``.npz``. The learned v0.1 lin heads are vendored
(``lpips_weights/alex_lin_v0.1.npz``, converted from the reference's
``networks/lpips/weights/v0.1/alex.pth``); the ImageNet AlexNet trunk is
not obtainable offline, so :func:`LPIPSScorer.from_default` falls back to
a deterministic fixed-seed trunk (see :func:`default_trunk`) and warns
once.

npz keys: ``conv{i}_w`` [out,in,kh,kw], ``conv{i}_b`` for i in 0..4 (the 5
AlexNet conv layers), ``lin{i}_w`` [1,C_i,1,1] for the heads.
:func:`convert_torch_weights` builds the npz from torchvision's
``alexnet-*.pth`` plus an LPIPS ``alex.pth`` lin-head file.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# input normalization (LPIPS ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet conv trunk: (out, kernel, stride, pad), maxpool after layers 0, 1
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (0, 0), (0, 0)])


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(weights: dict, im1, im2):
    """im1/im2: [B, 3, H, W] in [-1, 1]. Returns [B] distances."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def taps(x):
        h = (x - shift) / scale
        outs = []
        for i, (_, _, stride, pad) in enumerate(_ALEX):
            h = _conv(h, weights[f"conv{i}_w"], weights[f"conv{i}_b"],
                      stride, pad)
            h = jax.nn.relu(h)
            outs.append(h)
            if i in _POOL_AFTER:
                h = _maxpool(h)
        return outs

    f1, f2 = taps(jnp.asarray(im1)), taps(jnp.asarray(im2))
    total = 0.0
    for i in range(len(_ALEX)):
        d = (_normalize_tensor(f1[i]) - _normalize_tensor(f2[i])) ** 2
        lin = weights[f"lin{i}_w"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total


_VENDORED_LIN = os.path.join(os.path.dirname(__file__), "lpips_weights",
                             "alex_lin_v0.1.npz")
_FULL_BUNDLE = os.path.join(os.path.dirname(__file__), "lpips_weights",
                            "alex_full.npz")


def default_trunk(seed: int = 0) -> dict:
    """Deterministic He-initialized AlexNet trunk weights.

    This environment has no network egress and ships no ImageNet
    checkpoint, so the pretrained trunk the reference downloads through
    torchvision (ref: networks/lpips/pretrained_networks.py:47-56) is
    unobtainable offline. Fixed-seed random conv features are the
    documented fallback: LPIPS over random conv features is a known
    perceptual-distance baseline and is fully reproducible, but its values
    are NOT comparable to published LPIPS(alex) numbers. Drop an ImageNet
    bundle at ``lpips_weights/alex_full.npz`` (or point
    ``EVDEBLURNERF_LPIPS_WEIGHTS`` at one, built via
    :func:`convert_torch_weights`) to restore published semantics.
    """
    rng = np.random.default_rng(seed)
    out = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX):
        fan_in = in_ch * k * k
        std = np.sqrt(2.0 / fan_in)
        out[f"conv{i}_w"] = rng.normal(
            0.0, std, (out_ch, in_ch, k, k)).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    return out


class LPIPSScorer:
    def __init__(self, weights: dict, pretrained_trunk: bool = True):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        self.pretrained_trunk = pretrained_trunk
        self._fn = jax.jit(lambda a, b: lpips_distance(self.weights, a, b))

    @classmethod
    def from_npz(cls, path: str) -> "LPIPSScorer":
        return cls(dict(np.load(path)))

    @classmethod
    def from_env(cls) -> Optional["LPIPSScorer"]:
        path = os.environ.get("EVDEBLURNERF_LPIPS_WEIGHTS")
        if path and os.path.exists(path):
            return cls.from_npz(path)
        return None

    _warned = False

    @classmethod
    def from_torch_cache(cls) -> Optional["LPIPSScorer"]:
        """Probe the usual torch-hub cache locations for an ImageNet
        AlexNet checkpoint (``alexnet-owt-*.pth``); if found, convert it
        (with the reference's vendored lin heads) into the full bundle so
        published-semantics LPIPS(alex) is restored automatically on any
        machine that has ever downloaded torchvision's AlexNet."""
        import glob

        hub = os.environ.get(
            "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache",
                                       "torch"))
        candidates = sorted(glob.glob(os.path.join(
            hub, "hub", "checkpoints", "alexnet-owt-*.pth")))
        # torch-hub filenames embed the first 8 hex of the sha256; require
        # the pattern and VERIFY it before trusting a cache file with
        # published-comparable semantics. Every candidate is tried — a
        # corrupt or oddly-named first file must not shadow a valid second
        # (tools/convert_lpips_weights.py is the explicit, verbose path).
        import hashlib
        import re
        import warnings

        for cand in candidates:
            m = re.search(r"alexnet-owt-([0-9a-f]{8})\.pth$",
                          os.path.basename(cand))
            if not m:
                warnings.warn(
                    f"torch-hub cache file {cand} lacks the standard "
                    f"sha256-prefix filename; skipping it (rename to "
                    f"alexnet-owt-<sha8>.pth or use "
                    f"tools/convert_lpips_weights.py explicitly)")
                continue
            h = hashlib.sha256()
            with open(cand, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            if not h.hexdigest().startswith(m.group(1)):
                warnings.warn(f"torch-hub AlexNet at {cand} fails its "
                              f"filename sha256 prefix; ignoring it")
                continue
            # lin heads: the vendored npz (always present) unless a
            # torch-format file (e.g. an upstream LPIPS checkout's
            # weights/v0.1/alex.pth) is pointed at via env
            lin = os.environ.get("EVDEBLURNERF_LPIPS_LIN_PTH") or None
            if lin is not None and not os.path.exists(lin):
                lin = None
            try:
                convert_torch_weights(cand, lin, _FULL_BUNDLE)
                return cls.from_npz(_FULL_BUNDLE)
            except Exception as exc:
                warnings.warn(f"found a torch-hub AlexNet at {cand} "
                              f"but converting it failed ({exc}); "
                              f"trying the next candidate")
        return None

    @classmethod
    def from_default(cls) -> "LPIPSScorer":
        """Always-usable scorer: env bundle > vendored full bundle >
        torch-hub cache conversion > deterministic trunk + vendored LPIPS
        lin heads (loud, once)."""
        scorer = cls.from_env()
        if scorer is not None:
            return scorer
        if os.path.exists(_FULL_BUNDLE):
            return cls.from_npz(_FULL_BUNDLE)
        scorer = cls.from_torch_cache()
        if scorer is not None:
            return scorer
        weights = default_trunk()
        weights.update({k: v for k, v in np.load(_VENDORED_LIN).items()})
        if not cls._warned:
            cls._warned = True
            import warnings

            warnings.warn(
                "LPIPS: no ImageNet AlexNet trunk available (offline "
                "environment); using a deterministic fixed-seed trunk with "
                "the vendored LPIPS v0.1 lin heads. Distances are "
                "reproducible and rank-correlated but NOT comparable to "
                "published LPIPS(alex) numbers. See "
                "evdeblurnerf_tpu/models/lpips.py:default_trunk.",
                stacklevel=2)
        return cls(weights, pretrained_trunk=False)

    def __call__(self, im1, im2) -> float:
        """im1/im2: [H, W, 3] in [-1, 1]."""
        a = np.transpose(np.asarray(im1, np.float32), (2, 0, 1))[None]
        b = np.transpose(np.asarray(im2, np.float32), (2, 0, 1))[None]
        return float(self._fn(a, b)[0])


def convert_torch_weights(alexnet_pth: str, lin_pth: Optional[str],
                          out_npz: str):
    """Build the npz weight bundle from torch checkpoints (host tool).

    ``lin_pth`` may be a torch-format LPIPS lin-head file (the reference
    vendors one at networks/lpips/weights/v0.1/alex.pth) or None to use the
    already-converted vendored heads (:data:`_VENDORED_LIN`)."""
    import torch

    alex = torch.load(alexnet_pth, map_location="cpu")
    out = {}
    conv_ids = [0, 3, 6, 8, 10]          # torchvision alexnet.features idx
    for i, cid in enumerate(conv_ids):
        out[f"conv{i}_w"] = alex[f"features.{cid}.weight"].numpy()
        out[f"conv{i}_b"] = alex[f"features.{cid}.bias"].numpy()
    if lin_pth is None:
        out.update({k: v for k, v in np.load(_VENDORED_LIN).items()})
    else:
        lin = torch.load(lin_pth, map_location="cpu")
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            out[f"lin{i}_w"] = lin[key].numpy()
    np.savez(out_npz, **out)
