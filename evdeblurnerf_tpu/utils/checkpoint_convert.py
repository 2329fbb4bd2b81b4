"""Convert reference PyTorch checkpoints into this framework's parameters.

The reference trainer saves ``{global_step, network_state_dict (NeRFAll:
mlp_coarse/mlp_fine + kernelsnet + awpnet), crf_state_dict
(TonemappingTransform), optimizer_state_dict, wandb_id}`` as ``*.tar``
(ref: run_nerf.py:617-638). This module maps those torch-layout tensors
into our flax parameter tree so a model trained with the reference can be
evaluated, rendered, or fine-tuned here (CLI:
tools/convert_reference_checkpoint.py).

The name/layout correspondence is the exact inverse of the transplant used
by the parity oracles (tools/make_reference_fixtures.py), which is verified
against the live reference to ~1e-7 forward agreement; the round-trip is
pinned by tests/test_checkpoint_convert.py on recorded reference-shaped
state dicts.

Layout transforms: torch ``nn.Linear`` weights are [out, in] (ours:
[in, out] Dense kernels); Conv1d 1x1 weights are [out, in, 1]; the MAM
attention conv is [out, in, 1, 1]; tri-plane grids carry a leading
batch-1 axis (and lines a trailing width-1 axis) for ``F.grid_sample``
(ref: networks/pdrf/voxnerf.py:104-151). Adam moments are NOT converted —
fine-tuning restarts the optimizer, like the reference's own ``ft_path``
flow restarts schedules.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = ["convert_network_state_dict", "convert_crf_state_dict",
           "export_network_state_dict", "export_crf_state_dict",
           "merge_into_variables", "normalize_legacy_network_state_dict",
           "UnmappedKeysError"]


def normalize_legacy_network_state_dict(ckpt: dict):
    """Migrate a legacy two-network checkpoint (deblur-nerf/DP-NeRF era:
    ``network_fn_state_dict`` + ``network_fine_state_dict``) to the
    current single ``network_state_dict`` layout, the way the reference's
    ``smart_load_state_dict`` intends (ref: utils/misc.py:196-214 — its
    legacy branch prefixes the two MLPs as mlp_coarse./mlp_fine.; note it
    uses ``str.lstrip("module.")``, a charset strip, where a DataParallel
    'module.' PREFIX strip is clearly meant — done properly here).

    Returns the migrated network_state_dict, or None when ``ckpt`` is not
    a legacy checkpoint."""
    if "network_fn_state_dict" not in ckpt:
        return None

    def strip(k):
        return k[len("module."):] if k.startswith("module.") else k

    out = {f"mlp_coarse.{strip(k)}": v
           for k, v in ckpt["network_fn_state_dict"].items()}
    out.update({f"mlp_fine.{strip(k)}": v
                for k, v in ckpt.get("network_fine_state_dict", {}).items()})
    return out


class UnmappedKeysError(ValueError):
    pass


def _k(*parts) -> str:
    return "".join(f"[{p!r}]" for p in parts)


def _t(v):
    return np.ascontiguousarray(np.swapaxes(v, -1, -2))


# keys of the reference with no counterpart here, safely dropped:
# - awpnet.MAM.conv.*: dead weight — MotionAggregationModule.forward never
#   calls self.conv (ref: networks/dpnerf/mam.py:63-84)
# - num_batches_tracked: torch BatchNorm bookkeeping
_IGNORE = re.compile(
    r"^(awpnet\.MAM\.conv\.|.*\.num_batches_tracked$)")


def _rank_map(sd, pattern):
    """Sequential indices of Linears (activations occupy odd slots) ->
    dense ranks, e.g. kernelsnet.linears.{0,2,4} -> linears_{0,1,2}."""
    idx = sorted({int(m.group(1)) for key in sd
                  if (m := re.match(pattern, key))})
    return {i: j for j, i in enumerate(idx)}


def convert_network_state_dict(sd: Dict[str, np.ndarray]
                               ) -> Tuple[Dict[str, np.ndarray],
                                          Dict[str, np.ndarray]]:
    """Map a reference ``network_state_dict`` to (params, batch_stats),
    each a flat dict keyed by jax keystr relative to the model variables
    (``['params']['renderer']...``)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    unmapped = []

    dsk_linears = _rank_map(sd, r"kernelsnet\.linears\.(\d+)\.weight$")
    dsk_linears1 = _rank_map(sd, r"kernelsnet\.linears1\.(\d+)\.weight$")

    def lin(base_parts, name_map):
        """weight/bias of a torch Linear -> kernel/bias."""
        return {"weight": (base_parts + ("kernel",), _t),
                "bias": (base_parts + ("bias",), lambda v: v)}[name_map]

    for key, v in sd.items():
        if _IGNORE.match(key):
            continue

        # --- tri-plane / vanilla-NeRF fields -----------------------------
        m = re.match(r"^mlp_(coarse|fine)\.app_(plane|line)\.(\d)$", key)
        if m:
            stage, kind, i = m.groups()
            out = v[0] if kind == "plane" else v[0, :, :, 0]
            params[_k("params", "renderer", f"mlp_{stage}",
                      f"app_{kind}_{i}")] = out
            continue
        m = re.match(
            r"^mlp_(coarse|fine)\.(basis_mat|sigma_net\.\d+|color_net\.\d+|"
            r"pts_linears\.\d+|views_linears\.\d+|feature_linear|"
            r"alpha_linear|rgb_linear)\.(weight|bias)$", key)
        if m:
            stage, mod, wb = m.groups()
            mod = (mod.replace("sigma_net.", "sigma_net_")
                   .replace("color_net.", "color_net_")
                   .replace("pts_linears.", "pts_linear_")
                   .replace("views_linears.", "views_linear_"))
            parts, fn = lin(("params", "renderer", f"mlp_{stage}", mod), wb)
            params[_k(*parts)] = fn(v)
            continue

        # --- view embedding (plain table or table+MLP) --------------------
        # the reference MLP variant inherits the table attribute flat on the
        # module (ref: embedding.py:35-48); ours nests it as a 'table'
        # submodule, so the destination depends on the embed type
        if key in ("kernelsnet.view_embed_module.img_embed",
                   "kernelsnet.img_embed.img_embed"):
            mlp_embed = any("view_embed_linears" in k for k in sd)
            parts = (("params", "view_embed", "table", "img_embed")
                     if mlp_embed else ("params", "view_embed", "img_embed"))
            params[_k(*parts)] = v
            continue
        m = re.match(r"^kernelsnet\.(?:view_embed_module|img_embed)\."
                     r"view_embed_linears\.(\d+)\.(weight|bias)$", key)
        if m:
            i, wb = m.groups()
            parts, fn = lin(("params", "view_embed", f"linear_{i}"), wb)
            params[_k(*parts)] = fn(v)
            continue

        # --- RBK screw-motion branches ------------------------------------
        m = re.match(r"^kernelsnet\.([rvw])_(branch\.(\d+)|linear)\."
                     r"(weight|bias)$", key)
        if m:
            b, which, i, wb = m.groups()
            mod = f"{b}_branch_{i}" if i is not None else f"{b}_linear"
            parts, fn = lin(("params", "kernelnet", mod), wb)
            params[_k(*parts)] = fn(v)
            continue

        # --- DSK/PBE kernel ------------------------------------------------
        if key == "kernelsnet.pattern_pos":
            params[_k("params", "kernelnet", "pattern_pos")] = v
            continue
        m = re.match(r"^kernelsnet\.(linears1?)\.(\d+)\.(weight|bias)$", key)
        if m:
            seq, i, wb = m.groups()
            rank = (dsk_linears if seq == "linears" else dsk_linears1)[int(i)]
            parts, fn = lin(("params", "kernelnet", f"{seq}_{rank}"), wb)
            params[_k(*parts)] = fn(v)
            continue

        # --- AWP + MAM -----------------------------------------------------
        m = re.match(r"^awpnet\.(sample|motion)_feature_embed_layer\."
                     r"(\d+)\.(weight|bias)$", key)
        if m:
            kind, i, wb = m.groups()
            parts, fn = lin(("params", "awpnet",
                             f"{kind}_feature_embed_{i}"), wb)
            params[_k(*parts)] = fn(v)
            continue
        m = re.match(r"^awpnet\.(w_linear|MAM\.linear)\.(weight|bias)$", key)
        if m:
            mod, wb = m.groups()
            parts = (("params", "awpnet", "MAM", "linear")
                     if mod == "MAM.linear" else ("params", "awpnet", mod))
            parts, fn = lin(parts, wb)
            params[_k(*parts)] = fn(v)
            continue
        m = re.match(r"^awpnet\.MAM\.Corr\.(conva|convb|convc|convn|convl)"
                     r"\.weight$", key)
        if m:
            params[_k("params", "awpnet", "MAM", "Corr", m.group(1),
                      "kernel")] = _t(v[..., 0])
            continue
        if key == "awpnet.MAM.Corr.convd.0.weight":
            params[_k("params", "awpnet", "MAM", "Corr", "convd",
                      "kernel")] = _t(v[..., 0])
            continue
        m = re.match(r"^awpnet\.MAM\.Corr\.convd\.1\.(weight|bias|"
                     r"running_mean|running_var)$", key)
        if m:
            which = m.group(1)
            if which in ("weight", "bias"):
                params[_k("params", "awpnet", "MAM", "Corr", "convd_bn",
                          "scale" if which == "weight" else "bias")] = v
            else:
                stats[_k("batch_stats", "awpnet", "MAM", "Corr", "convd_bn",
                         which.replace("running_", ""))] = v
            continue
        if key == "awpnet.MAM.Corr.line_conv_att.weight":
            params[_k("params", "awpnet", "MAM", "Corr", "line_conv_att",
                      "kernel")] = _t(v[:, :, 0, 0])
            continue

        unmapped.append(key)

    if unmapped:
        raise UnmappedKeysError(
            "unrecognized reference network_state_dict keys (for legacy "
            "two-network checkpoints run "
            "normalize_legacy_network_state_dict first): "
            f"{sorted(unmapped)}")
    return params, stats


def convert_crf_state_dict(sd: Dict[str, np.ndarray]
                           ) -> Dict[str, np.ndarray]:
    """Map a reference ``crf_state_dict`` (TonemappingTransform) to flat
    params keyed ``['params']['tonemapping_{rgb,event}']['linear_j']...``.
    Only ``learn`` heads carry parameters (ref: tonemapping.py:16-27)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, np.ndarray] = {}
    unmapped = []
    ranks = {head: _rank_map(sd, rf"tonemapping_{head}\.linear\.(\d+)"
                                 r"\.weight$")
             for head in ("rgb", "event")}
    for key, v in sd.items():
        m = re.match(r"^tonemapping_(rgb|event)\.linear\.(\d+)\."
                     r"(weight|bias)$", key)
        if not m:
            unmapped.append(key)
            continue
        head, i, wb = m.groups()
        j = ranks[head][int(i)]
        out = _t(v) if wb == "weight" else v
        params[_k("params", f"tonemapping_{head}", f"linear_{j}",
                  "kernel" if wb == "weight" else "bias")] = out
    if unmapped:
        raise UnmappedKeysError(
            f"unrecognized reference crf_state_dict keys: {sorted(unmapped)}")
    return params


def export_network_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_network_state_dict`: map this framework's
    network variables (``{'params': ..., 'batch_stats': ...}``) to a
    reference ``network_state_dict`` in torch layout that
    ``NeRFAll.load_state_dict`` accepts strict (ref: utils/misc.py:198-214).

    The kernel family is inferred from the parameter names (RBK stores the
    view embedding under ``view_embed_module``, DSK/PBE under ``img_embed``
    — ref: dpnerf/blurmodel.py:16 vs pdrf/blurmodel.py:75). Weights the
    reference module owns but never uses in forward (``awpnet.MAM.conv``,
    ref: dpnerf/mam.py:63-66) plus BatchNorm ``num_batches_tracked`` are
    synthesized (zeros/identity) so strict loading succeeds.
    """
    import jax

    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_leaves_with_path(variables)}
    is_rbk = any("['kernelnet']['r_branch_" in k or
                 "['kernelnet']['r_linear']" in k for k in flat)
    ve = "view_embed_module" if is_rbk else "img_embed"
    sd: Dict[str, np.ndarray] = {}
    unmapped = []

    def tt(v):
        return np.asarray(v, np.float32)

    for key, v in flat.items():
        # --- tri-plane / vanilla-NeRF fields -----------------------------
        m = re.match(r"^\['params'\]\['renderer'\]\['mlp_(coarse|fine)'\]"
                     r"\['app_(plane|line)_(\d)'\]$", key)
        if m:
            stage, kind, i = m.groups()
            out = v[None] if kind == "plane" else v[None, :, :, None]
            sd[f"mlp_{stage}.app_{kind}.{i}"] = tt(out)
            continue
        m = re.match(r"^\['params'\]\['renderer'\]\['mlp_(coarse|fine)'\]"
                     r"\['(\w+?)(?:_(\d+))?'\]\['(kernel|bias)'\]$", key)
        if m:
            stage, mod, i, kb = m.groups()
            if mod in ("pts_linear", "views_linear"):
                mod += "s"
            name = f"mlp_{stage}.{mod}" + (f".{i}" if i is not None else "")
            sd[f"{name}.{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue

        # --- view embedding (the MLP variant nests the table: see import) --
        if key in (_k("params", "view_embed", "img_embed"),
                   _k("params", "view_embed", "table", "img_embed")):
            sd[f"kernelsnet.{ve}.img_embed"] = tt(v)
            continue
        m = re.match(r"^\['params'\]\['view_embed'\]\['linear_(\d+)'\]"
                     r"\['(kernel|bias)'\]$", key)
        if m:
            i, kb = m.groups()
            sd[f"kernelsnet.{ve}.view_embed_linears.{i}."
               f"{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue

        # --- RBK / DSK / PBE kernel -----------------------------------------
        m = re.match(r"^\['params'\]\['kernelnet'\]\['([rvw])_"
                     r"(branch_(\d+)|linear)'\]\['(kernel|bias)'\]$", key)
        if m:
            b, which, i, kb = m.groups()
            name = (f"kernelsnet.{b}_branch.{i}" if i is not None
                    else f"kernelsnet.{b}_linear")
            sd[f"{name}.{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue
        if key == _k("params", "kernelnet", "pattern_pos"):
            sd["kernelsnet.pattern_pos"] = tt(v)
            continue
        m = re.match(r"^\['params'\]\['kernelnet'\]\['(linears1?)_(\d+)'\]"
                     r"\['(kernel|bias)'\]$", key)
        if m:
            seq, j, kb = m.groups()
            # torch Sequential interleaves ReLUs: dense rank j -> index 2j
            # (ref: pdrf/blurmodel.py:96-105)
            sd[f"kernelsnet.{seq}.{2 * int(j)}."
               f"{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue

        # --- AWP + MAM -------------------------------------------------------
        m = re.match(r"^\['params'\]\['awpnet'\]\['(sample|motion)_feature"
                     r"_embed_(\d+)'\]\['(kernel|bias)'\]$", key)
        if m:
            kind, i, kb = m.groups()
            sd[f"awpnet.{kind}_feature_embed_layer.{i}."
               f"{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue
        m = re.match(r"^\['params'\]\['awpnet'\]\['w_linear'\]"
                     r"\['(kernel|bias)'\]$", key)
        if m:
            kb = m.group(1)
            sd[f"awpnet.w_linear.{'weight' if kb == 'kernel' else 'bias'}"] \
                = tt(_t(v) if kb == "kernel" else v)
            continue
        m = re.match(r"^\['params'\]\['awpnet'\]\['MAM'\]\['linear'\]"
                     r"\['(kernel|bias)'\]$", key)
        if m:
            kb = m.group(1)
            sd[f"awpnet.MAM.linear."
               f"{'weight' if kb == 'kernel' else 'bias'}"] = \
                tt(_t(v) if kb == "kernel" else v)
            continue
        m = re.match(r"^\['params'\]\['awpnet'\]\['MAM'\]\['Corr'\]"
                     r"\['(conva|convb|convc|convn|convl)'\]\['kernel'\]$",
                     key)
        if m:
            sd[f"awpnet.MAM.Corr.{m.group(1)}.weight"] = tt(_t(v)[..., None])
            continue
        if key == _k("params", "awpnet", "MAM", "Corr", "convd", "kernel"):
            sd["awpnet.MAM.Corr.convd.0.weight"] = tt(_t(v)[..., None])
            continue
        m = re.match(r"^\['params'\]\['awpnet'\]\['MAM'\]\['Corr'\]"
                     r"\['convd_bn'\]\['(scale|bias)'\]$", key)
        if m:
            which = "weight" if m.group(1) == "scale" else "bias"
            sd[f"awpnet.MAM.Corr.convd.1.{which}"] = tt(v)
            continue
        m = re.match(r"^\['batch_stats'\]\['awpnet'\]\['MAM'\]\['Corr'\]"
                     r"\['convd_bn'\]\['(mean|var)'\]$", key)
        if m:
            sd[f"awpnet.MAM.Corr.convd.1.running_{m.group(1)}"] = tt(v)
            continue
        if key == _k("params", "awpnet", "MAM", "Corr", "line_conv_att",
                     "kernel"):
            sd["awpnet.MAM.Corr.line_conv_att.weight"] = \
                tt(v.T[..., None, None])
            continue

        unmapped.append(key)

    if unmapped:
        raise UnmappedKeysError(
            f"cannot export model leaves to the reference layout: "
            f"{sorted(unmapped)}")

    if any(k.startswith("awpnet.") for k in sd):
        # dead + bookkeeping weights the reference module owns
        # (strict load_state_dict requires them)
        c = sd["awpnet.w_linear.weight"].shape[1]       # W_mot
        sd["awpnet.MAM.Corr.convd.1.num_batches_tracked"] = \
            np.asarray(0, np.int64)
        sd["awpnet.MAM.conv.0.weight"] = np.zeros((c, 2 * c, 1, 1),
                                                  np.float32)
        sd["awpnet.MAM.conv.1.weight"] = np.ones(c, np.float32)
        sd["awpnet.MAM.conv.1.bias"] = np.zeros(c, np.float32)
        sd["awpnet.MAM.conv.1.running_mean"] = np.zeros(c, np.float32)
        sd["awpnet.MAM.conv.1.running_var"] = np.ones(c, np.float32)
        sd["awpnet.MAM.conv.1.num_batches_tracked"] = \
            np.asarray(0, np.int64)
    return sd


def export_crf_state_dict(crf_params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_crf_state_dict`: flax CRF params
    (``{'tonemapping_rgb': ..., 'tonemapping_event': ...}``) to a reference
    ``crf_state_dict`` (learn heads are Sequentials with ReLUs at odd
    slots — ref: tonemapping.py:16-27)."""
    import jax

    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_leaves_with_path({"params": crf_params})}
    sd: Dict[str, np.ndarray] = {}
    unmapped = []
    for key, v in flat.items():
        m = re.match(r"^\['params'\]\['tonemapping_(rgb|event)'\]"
                     r"\['linear_(\d+)'\]\['(kernel|bias)'\]$", key)
        if not m:
            unmapped.append(key)
            continue
        head, j, kb = m.groups()
        sd[f"tonemapping_{head}.linear.{2 * int(j)}."
           f"{'weight' if kb == 'kernel' else 'bias'}"] = \
            np.asarray(_t(v) if kb == "kernel" else v, np.float32)
    if unmapped:
        raise UnmappedKeysError(
            f"cannot export CRF leaves to the reference layout: "
            f"{sorted(unmapped)}")
    return sd


def merge_into_variables(template_vars, flat_updates: Dict[str, np.ndarray],
                         label: str = "checkpoint"):
    """Replace leaves of ``template_vars`` (a variables dict with 'params'
    and optionally 'batch_stats') named in ``flat_updates`` (jax keystr ->
    array). Every update must match an existing leaf in name AND shape;
    leaves not updated keep their template values (fresh init)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(template_vars)
    by_key = {jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves}
    extra = sorted(set(flat_updates) - set(by_key))
    if extra:
        raise UnmappedKeysError(
            f"{label}: converted keys missing from the model (config "
            f"mismatch?): {extra}")
    for k, v in flat_updates.items():
        if by_key[k].shape != np.asarray(v).shape:
            raise UnmappedKeysError(
                f"{label}: shape mismatch at {k}: model "
                f"{by_key[k].shape} vs checkpoint {np.asarray(v).shape} "
                "(config mismatch?)")
    untouched = sorted(set(by_key) - set(flat_updates))

    treedef = jax.tree_util.tree_structure(template_vars)
    new_leaves = [flat_updates.get(jax.tree_util.keystr(p),
                                   np.asarray(v)).astype(
                      np.asarray(v).dtype)
                  for p, v in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), untouched
