"""Load torch pretrained backbones into the Flax ResNet.

The reference trains from ImageNet-pretrained ResNet-101 weights — either
torchvision's or PLOP's `resnet101_iabn_sync` release
(reference: networks/resnet.py:432-488, networks/deeplab_v3.py:36-49
`backbone_weights_path`).  This converter maps an ABN-style torch state_dict
(`mod1.conv1.weight`, `mod2.block1.convs.conv1.weight`,
`...bn1.weight/bias/running_mean/running_var`, `proj_conv/proj_bn`) onto our
parameter tree (resnet.py module names `mod{k}_block{j}/conv{i}.kernel`).

Conversion rules:
- conv weight  [out, in, kh, kw]  →  kernel [kh, kw, in, out]
- ABN/BN weight/bias              →  scale/bias params (|weight| for ABN,
                                     which stores the scale magnitude)
- running_mean/var                →  batch_stats mean/var
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_flax_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(
        os.path.expanduser(path), map_location="cpu", weights_only=False
    )
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "model_state"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    out = {}
    for k, v in ckpt.items():
        k = k.replace("module.", "")
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            continue
    return out


def load_pretrained_backbone(
    path: str, variables: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Returns (params, batch_stats, n_tensors_loaded)."""
    sd = load_torch_state_dict(path)
    return _convert(sd, variables["params"], variables.get("batch_stats", {}))


def _convert(sd, params, batch_stats):
    import jax.numpy as jnp

    def clone(t):
        if isinstance(t, dict):
            return {k: clone(v) for k, v in t.items()}
        return t

    params = clone(params)
    batch_stats = clone(batch_stats)
    bb_p = params.get("backbone", {})
    bb_s = batch_stats.get("backbone", {})
    sd = {re.sub(r"^(body|module)\.", "", k): v for k, v in sd.items()}

    def set_leaf(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf in node and tuple(node[leaf].shape) == tuple(value.shape):
            node[leaf] = jnp.asarray(value)
            return True
        return False

    def set_norm(path, leaf, value):
        if leaf == "weight":
            return set_leaf(bb_p, path + ["scale"], np.abs(value))
        if leaf == "bias":
            return set_leaf(bb_p, path + ["bias"], value)
        if leaf == "running_mean":
            return set_leaf(bb_s, path + ["mean"], value)
        if leaf == "running_var":
            return set_leaf(bb_s, path + ["var"], value)
        return False

    loaded = 0
    for key, value in sd.items():
        parts = key.replace(".convs.", ".").split(".")
        if parts[0] == "mod1":
            # stem: mod1.conv1.weight, mod1.bn1.*
            if len(parts) >= 3 and parts[1] == "conv1" and parts[2] == "weight":
                loaded += set_leaf(bb_p, ["conv1", "kernel"], _to_flax_conv(value))
            elif len(parts) >= 3 and parts[1] == "bn1":
                loaded += set_norm(["bn1"], parts[2], value)
            continue
        m = re.match(r"mod(\d+)$", parts[0])
        b = re.match(r"block(\d+)$", parts[1]) if len(parts) > 2 else None
        if not (m and b):
            continue
        mod = f"{parts[0]}_block{b.group(1)}"
        layer = parts[2]
        leaf = parts[3] if len(parts) > 3 else None
        if layer.startswith("conv") and leaf == "weight":
            loaded += set_leaf(bb_p, [mod, layer, "kernel"], _to_flax_conv(value))
        elif layer == "proj_conv" and leaf == "weight":
            loaded += set_leaf(
                bb_p, [mod, "proj_conv", "kernel"], _to_flax_conv(value)
            )
        elif layer.startswith("bn") or layer == "proj_bn":
            loaded += set_norm([mod, layer], leaf, value)
    params["backbone"] = bb_p
    batch_stats["backbone"] = bb_s
    return params, batch_stats, loaded


def _convert_atrous_backbone(sd, params, batch_stats):
    """Map the SDR ResNet_Atrous layout (`layer{s}.{b}.conv{i}/bn{i}`,
    `downsample.0/1`; reference: networks/resnet_atrous.py) onto the Flax
    `layer{s}_block{b+1}` tree.  Plain-BN scales are used as-is (signed),
    unlike the ABN |scale| convention."""
    import jax.numpy as jnp

    def clone(t):
        if isinstance(t, dict):
            return {k: clone(v) for k, v in t.items()}
        return t

    params = clone(params)
    batch_stats = clone(batch_stats)
    bb_p = params.get("backbone", {})
    bb_s = batch_stats.get("backbone", {})

    def set_leaf(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf in node and tuple(node[leaf].shape) == tuple(value.shape):
            node[leaf] = jnp.asarray(value)
            return True
        return False

    def set_norm(path, leaf, value):
        if leaf == "weight":
            return set_leaf(bb_p, path + ["scale"], value)
        if leaf == "bias":
            return set_leaf(bb_p, path + ["bias"], value)
        if leaf == "running_mean":
            return set_leaf(bb_s, path + ["mean"], value)
        if leaf == "running_var":
            return set_leaf(bb_s, path + ["var"], value)
        return False

    loaded = 0
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "conv1" and parts[-1] == "weight":
            loaded += set_leaf(bb_p, ["conv1", "kernel"], _to_flax_conv(value))
        elif parts[0] == "bn1":
            loaded += set_norm(["bn1"], parts[1], value)
        elif parts[0].startswith("layer"):
            mod = f"{parts[0]}_block{int(parts[1]) + 1}"
            layer = parts[2]
            if layer.startswith("conv") and parts[-1] == "weight":
                loaded += set_leaf(bb_p, [mod, layer, "kernel"], _to_flax_conv(value))
            elif layer.startswith("bn"):
                loaded += set_norm([mod, layer], parts[3], value)
            elif layer == "downsample":
                # downsample.0 = 1x1 conv, downsample.1 = BN
                if parts[3] == "0" and parts[-1] == "weight":
                    loaded += set_leaf(
                        bb_p,
                        [mod, "downsample_conv", "kernel"],
                        _to_flax_conv(value),
                    )
                elif parts[3] == "1":
                    loaded += set_norm([mod, "downsample_bn"], parts[4], value)
    params["backbone"] = bb_p
    batch_stats["backbone"] = bb_s
    return params, batch_stats, loaded


def convert_reference_deeplab(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Convert a FULL reference-DeepLabV3 torch state dict to Flax variables.

    Maps backbone (`backbone.mod*`), ASPP head (`base_classifier.*`,
    reference: networks/deeplab_v3.py:175-305), classifier head(s)
    (single conv or per-task ModuleList concatenated into the padded head,
    reference: networks/base_network.py:99-118), and the BACS BgDetector
    (`seen_fg_network.*`, reference: networks/bg_detector.py) onto this
    repo's DeepLabV3 parameter tree.  Used by the torch↔JAX parity tests.

    Returns (params, batch_stats, n_tensors_loaded).
    """
    import jax.numpy as jnp

    # BNReLUAct wraps a plain BatchNorm2d in a `.bn` submodule
    # (reference: deeplab_v3.py:308-332) — collapse that level.
    sd = {k.replace("_bn.bn.", "_bn."): v for k, v in sd.items()}
    is_atrous = any(k.startswith("backbone.layer1.") for k in sd)
    backbone_sd = {
        k[len("backbone.") :]: v
        for k, v in sd.items()
        if k.startswith("backbone.")
    }
    if is_atrous:
        params, batch_stats, loaded = _convert_atrous_backbone(
            backbone_sd, variables["params"], variables.get("batch_stats", {})
        )
    else:
        params, batch_stats, loaded = _convert(
            backbone_sd, variables["params"], variables.get("batch_stats", {})
        )
    hd_p = params.get("base_classifier", {})
    hd_s = batch_stats.get("base_classifier", {})

    def set_leaf(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf in node and tuple(node[leaf].shape) == tuple(value.shape):
            node[leaf] = jnp.asarray(value)
            return True
        return False

    def set_norm(tree_p, tree_s, mod, leaf, value):
        if leaf == "weight":
            # inplace-ABN reparameterizes scale as |weight|; the atrous/`bn`
            # variant uses plain signed BatchNorm2d (BNReLUAct) — abs() there
            # would silently flip negative head scales
            scale = value if is_atrous else np.abs(value)
            return set_leaf(tree_p, [mod, "scale"], scale)
        if leaf == "bias":
            return set_leaf(tree_p, [mod, "bias"], value)
        if leaf == "running_mean":
            return set_leaf(tree_s, [mod, "mean"], value)
        if leaf == "running_var":
            return set_leaf(tree_s, [mod, "var"], value)
        return False

    head_rows: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    det_rows: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "base_classifier":
            if parts[1] == "map_convs" and parts[3] == "weight":
                loaded += set_leaf(
                    hd_p, [f"map_conv{parts[2]}", "kernel"], _to_flax_conv(value)
                )
            elif parts[1].endswith("_conv") and parts[2] == "weight":
                loaded += set_leaf(hd_p, [parts[1], "kernel"], _to_flax_conv(value))
            elif parts[1].endswith("_bn"):
                loaded += set_norm(hd_p, hd_s, parts[1], parts[2], value)
        elif parts[0] == "classifier_head":
            # single conv: classifier_head.weight / .bias
            # ModuleList:  classifier_head.<t>.weight / .bias
            idx = 0 if parts[1] in ("weight", "bias") else int(parts[1])
            w, b = head_rows.get(idx, (None, None))
            if parts[-1] == "weight":
                head_rows[idx] = (value, b)
            elif parts[-1] == "bias":
                head_rows[idx] = (w, value)
        elif parts[0] == "seen_fg_network":
            det = params.get("seen_fg_network", {})
            det_s = batch_stats.get("seen_fg_network", {})
            if parts[1] == "base_layers":
                if parts[2] == "0" and parts[3] == "weight":
                    loaded += set_leaf(
                        det, ["base_conv", "kernel"], _to_flax_conv(value)
                    )
                elif parts[2] == "1":
                    # torch BatchNorm2d: scale used as-is (not ABN-style |w|)
                    if parts[3] == "weight":
                        loaded += set_leaf(det, ["base_bn", "scale"], value)
                    else:
                        loaded += set_norm(det, det_s, "base_bn", parts[3], value)
            elif parts[1] == "seen_not_seen_clf":
                idx = 0 if parts[2] == "conv" else int(parts[2])
                w, b = det_rows.get(idx, (None, None))
                if parts[-1] == "weight":
                    det_rows[idx] = (value, b)
                elif parts[-1] == "bias":
                    det_rows[idx] = (w, value)

    if head_rows:
        ws = [head_rows[i][0] for i in sorted(head_rows)]
        bs = [head_rows[i][1] for i in sorted(head_rows)]
        w = np.concatenate(ws, axis=0)  # [C, in, 1, 1]
        b = np.concatenate(bs, axis=0)
        hp = params["classifier_head"]
        n = min(hp["kernel"].shape[-1], w.shape[0])
        kernel = np.asarray(hp["kernel"]).copy()
        bias = np.asarray(hp["bias"]).copy()
        kernel[..., :n] = _to_flax_conv(w)[..., :n]
        bias[:n] = b[:n]
        hp["kernel"] = jnp.asarray(kernel)
        hp["bias"] = jnp.asarray(bias)
        loaded += 2 * len(head_rows)
    if det_rows:
        det = params["seen_fg_network"]
        hk = np.asarray(det["head_kernel"]).copy()
        hb = np.asarray(det["head_bias"]).copy()
        for i, (w, b) in det_rows.items():
            hk[i] = w[:, :, 0, 0].T  # [1, D, 1, 1] → [D, 1]
            hb[i] = b
        det["head_kernel"] = jnp.asarray(hk)
        det["head_bias"] = jnp.asarray(hb)
        loaded += 2 * len(det_rows)
    params["base_classifier"] = hd_p
    batch_stats["base_classifier"] = hd_s
    return params, batch_stats, loaded


def convert_reference_transeg(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Convert a reference TranSeg torch state dict to Flax variables.

    Maps the ResNet backbone (shared with convert_reference_deeplab) plus
    the TransformerHead (reference: networks/transeg.py:85-175 —
    feature_embedding, pos_embed, class_tokens, decoder blocks
    (networks/layers.py:39-95), proj_patch/proj_classes, decoder_norm,
    mask_norm) onto this repo's TranSeg parameter tree
    (models/transeg.py).  The unused inherited `classifier_head` conv is
    skipped (the reference TranSeg forward never calls it).

    Returns (params, batch_stats, n_tensors_loaded).
    """
    import jax.numpy as jnp

    backbone_sd = {
        k[len("backbone.") :]: v
        for k, v in sd.items()
        if k.startswith("backbone.")
    }
    params, batch_stats, loaded = _convert(
        backbone_sd, variables["params"], variables.get("batch_stats", {})
    )
    hd = params["base_classifier"]

    def put(node, path, value):
        for p in path[:-1]:
            node = node[p]
        leaf = path[-1]
        assert tuple(node[leaf].shape) == tuple(value.shape), (
            path, node[leaf].shape, value.shape,
        )
        node[leaf] = jnp.asarray(value)

    for key, v in sd.items():
        if not key.startswith("base_classifier."):
            continue
        parts = key.split(".")[1:]
        name = parts[0]
        if name == "feature_embedding":
            if parts[1] == "weight":
                put(hd, ["feature_embedding", "kernel"], _to_flax_conv(v))
            else:
                put(hd, ["feature_embedding", "bias"], v)
        elif name == "pos_embed":
            put(hd, ["pos_embed"], np.transpose(v, (0, 2, 3, 1)))
        elif name == "class_tokens":
            put(hd, ["class_tokens"], v[0])
        elif name == "mask_norm":
            put(
                hd,
                ["mask_norm_scale" if parts[1] == "weight" else "mask_norm_bias"],
                v,
            )
        elif name in ("proj_patch", "proj_classes"):
            put(hd, [name], v)
        elif name == "decoder_norm":
            put(hd, ["decoder_norm", "scale" if parts[1] == "weight" else "bias"], v)
        elif name == "blocks":
            blk = hd[f"block{parts[1]}"]
            sub, leaf = parts[2], parts[-1]
            if sub in ("norm1", "norm2"):
                put(blk, [sub, "scale" if leaf == "weight" else "bias"], v)
            elif sub == "attn":  # qkv / proj linear layers
                if leaf == "weight":
                    put(blk, ["attn", parts[3], "kernel"], v.T)
                else:
                    put(blk, ["attn", parts[3], "bias"], v)
            elif sub == "mlp":
                which = "mlp_fc1" if parts[3] == "fc1" else "mlp_fc2"
                if leaf == "weight":
                    put(blk, [which, "kernel"], v.T)
                else:
                    put(blk, [which, "bias"], v)
            else:
                continue
        else:
            continue
        loaded += 1
    params["base_classifier"] = hd
    return params, batch_stats, loaded


def convert_reference_unet(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Convert a reference UNet torch state dict to Flax variables
    (reference: networks/unet.py:10-180 — DoubleConv stacks, Down/Up
    blocks, plain BatchNorm2d, 1x1 classifier head).

    Returns (params, batch_stats, n_tensors_loaded).
    """
    import jax.numpy as jnp

    def clone(t):
        if isinstance(t, dict):
            return {k: clone(v) for k, v in t.items()}
        return t

    params = clone(variables["params"])
    batch_stats = clone(variables.get("batch_stats", {}))

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        leaf = path[-1]
        assert tuple(node[leaf].shape) == tuple(value.shape), (
            path, node[leaf].shape, value.shape,
        )
        node[leaf] = jnp.asarray(value)
        return 1

    # torch DoubleConv indices -> (flax name, is_bn)
    dc_map = {"0": ("conv1", False), "1": ("bn1", True),
              "3": ("conv2", False), "4": ("bn2", True)}

    def put_dc(blk, idx, leaf, value):
        name, is_bn = dc_map[idx]
        if not is_bn:
            if leaf == "weight":
                return put(params, blk + [name, "kernel"], _to_flax_conv(value))
            return put(params, blk + [name, "bias"], value)
        # plain BatchNorm2d: signed scale (no ABN abs-reparam)
        if leaf == "weight":
            return put(params, blk + [name, "scale"], value)
        if leaf == "bias":
            return put(params, blk + [name, "bias"], value)
        if leaf == "running_mean":
            return put(batch_stats, blk + [name, "mean"], value)
        if leaf == "running_var":
            return put(batch_stats, blk + [name, "var"], value)
        return 0  # num_batches_tracked

    loaded = 0
    for key, v in sd.items():
        parts = key.split(".")
        if parts[0] == "inc":
            loaded += put_dc(["inc"], parts[2], parts[3], v)
        elif parts[0] == "downsample":
            # downsample.<i>.maxpool_conv.1.double_conv.<j>.<leaf>
            blk = [f"down{int(parts[1]) + 1}"]
            loaded += put_dc(blk, parts[5], parts[6], v)
        elif parts[0] == "upsample":
            i = int(parts[1])
            if parts[2] == "up":  # ConvTranspose2d (non-bilinear)
                if parts[3] == "weight":
                    # torch [in, out, kh, kw] -> flax [kh, kw, in, out];
                    # torch ConvTranspose2d is the conv gradient, i.e. a
                    # spatially flipped kernel vs lax.conv_transpose
                    loaded += put(
                        params, [f"up_tconv{i + 1}", "kernel"],
                        np.transpose(v[..., ::-1, ::-1], (2, 3, 0, 1)),
                    )
                else:
                    loaded += put(params, [f"up_tconv{i + 1}", "bias"], v)
            else:  # upsample.<i>.conv.double_conv.<j>.<leaf>
                loaded += put_dc([f"up{i + 1}"], parts[4], parts[5], v)
        elif parts[0] == "classifier_head":
            if parts[-1] == "weight":
                hp = params["classifier_head"]
                k = _to_flax_conv(v)
                n = min(hp["kernel"].shape[-1], k.shape[-1])
                kernel = np.asarray(hp["kernel"]).copy()
                kernel[..., :n] = k[..., :n]
                hp["kernel"] = jnp.asarray(kernel)
                loaded += 1
            else:
                hp = params["classifier_head"]
                n = min(hp["bias"].shape[0], v.shape[0])
                bias = np.asarray(hp["bias"]).copy()
                bias[:n] = v[:n]
                hp["bias"] = jnp.asarray(bias)
                loaded += 1
    return params, batch_stats, loaded


# --------------------------------------------------------------------------
# Export: Flax backbone → PLOP-release checkpoint format
# --------------------------------------------------------------------------

def _to_torch_conv(k: np.ndarray) -> np.ndarray:
    # kernel [kh, kw, in, out] → weight [out, in, kh, kw]
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def export_backbone_release(variables: Dict[str, Any], path: str,
                            n_fc_classes: int = 1000) -> int:
    """Write our Flax ResNet backbone as a `resnet101_iabn_sync.pth.tar`-style
    release checkpoint — the EXACT layout the reference consumes
    (reference: networks/resnet.py:455-488: `torch.load(..)["state_dict"]`,
    keys `module.`-prefixed, `module.classifier.fc.{weight,bias}` present and
    deleted by the loader; block convs live under `.convs.`).

    This is the inverse of `load_pretrained_backbone` up to the ABN
    |weight| convention (inplace-ABN applies abs(weight) at forward time,
    so the importer takes the magnitude).  Returns the number of backbone
    tensors written (excluding the synthesized classifier head).
    """
    import torch

    bb_p = variables["params"]["backbone"]
    bb_s = variables.get("batch_stats", {}).get("backbone", {})
    sd: Dict[str, Any] = {}
    written = 0

    def put(key: str, value: np.ndarray):
        nonlocal written
        # copy=True: jax arrays expose read-only buffers torch can't wrap
        sd[f"module.{key}"] = torch.from_numpy(
            np.array(value, np.float32, copy=True))
        written += 1

    def put_norm(tkey: str, mod_p: Dict[str, Any], mod_s: Dict[str, Any]):
        put(f"{tkey}.weight", mod_p["scale"])
        put(f"{tkey}.bias", mod_p["bias"])
        put(f"{tkey}.running_mean", mod_s["mean"])
        put(f"{tkey}.running_var", mod_s["var"])

    for name in sorted(bb_p):
        node_p, node_s = bb_p[name], bb_s.get(name, {})
        if name == "conv1":
            put("mod1.conv1.weight", _to_torch_conv(node_p["kernel"]))
        elif name == "bn1":
            put_norm("mod1.bn1", node_p, node_s)
        else:
            m = re.match(r"mod(\d+)_block(\d+)$", name)
            if not m:
                raise ValueError(f"unexpected backbone module {name!r}")
            base = f"mod{m.group(1)}.block{m.group(2)}"
            for sub in sorted(node_p):
                if sub.startswith("conv"):
                    put(f"{base}.convs.{sub}.weight",
                        _to_torch_conv(node_p[sub]["kernel"]))
                elif sub.startswith("bn"):
                    put_norm(f"{base}.convs.{sub}", node_p[sub], node_s[sub])
                elif sub == "proj_conv":
                    put(f"{base}.proj_conv.weight",
                        _to_torch_conv(node_p[sub]["kernel"]))
                elif sub == "proj_bn":
                    put_norm(f"{base}.proj_bn", node_p[sub], node_s[sub])
                else:
                    raise ValueError(f"unexpected leaf {name}.{sub}")

    n_bb = written
    # the release file carries an ImageNet fc the reference loader deletes
    # (networks/resnet.py:480-481); synthesize it for format exactness
    out_ch = int(np.asarray(bb_p["bn1"]["scale"]).shape[0])
    for name in bb_p:
        mm = re.match(r"mod(\d+)_block(\d+)$", name)
        if mm and "conv3" in bb_p[name]:
            out_ch = max(out_ch, int(
                np.asarray(bb_p[name]["conv3"]["kernel"]).shape[-1]))
        elif mm and "conv2" in bb_p[name]:
            out_ch = max(out_ch, int(
                np.asarray(bb_p[name]["conv2"]["kernel"]).shape[-1]))
    put("classifier.fc.weight", np.zeros((n_fc_classes, out_ch), np.float32))
    put("classifier.fc.bias", np.zeros((n_fc_classes,), np.float32))

    torch.save({"state_dict": sd}, os.path.expanduser(path))
    return n_bb
