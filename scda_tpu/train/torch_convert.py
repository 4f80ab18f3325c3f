"""Torch state-dict -> Flax params converter for pretrained backbones.

Rebuild of the reference's pretrained-weight loading
(ref lib/model/faster_rcnn/vgg16.py:~40 ``vgg.load_state_dict(torch.load(
self.model_path))`` and resnet.py:~230): the reference loads caffe-lineage
``.pth`` files (``vgg16_caffe.pth``, ``resnet101_caffe.pth``) whose inputs
are BGR 0-255 mean-subtracted images — exactly what
:mod:`scda_tpu.data.pipeline` produces — so converted weights drop in
unchanged.

Layout conversions (torch -> flax/NHWC):
  * Conv weight  (O, I, kH, kW) -> kernel (kH, kW, I, O)
  * Linear weight (O, I)        -> kernel (I, O)
  * BatchNorm (weight, bias, running_mean, running_var)
        -> FrozenBatchNorm (scale, bias, mean, var)

The VGG16 flax module names its convs ``conv{torch_index}`` and the head
``fc6``/``fc7`` to make this mapping 1:1 (models/backbones/vgg.py); the
ResNet module mirrors torchvision's ``layerL.B`` as ``layerL/blockB``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from scda_tpu.models.backbones.vgg import VGG16_LAYOUT


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (1, 0))


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def convert_vgg16(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision/caffe VGG16 state dict -> {'backbone': .., 'head': ..}.

    Accepts both bare-VGG keys (``features.0.weight``) and the
    classifier keys (``classifier.0.*`` fc6, ``classifier.3.*`` fc7).
    """
    sd = {k: v for k, v in state_dict.items()}
    backbone: Dict[str, Any] = {}
    for item in VGG16_LAYOUT:
        if item == "M":
            continue
        idx, _ = item
        backbone[f"conv{idx}"] = {
            "kernel": _conv_kernel(sd[f"features.{idx}.weight"]),
            "bias": _f32(sd[f"features.{idx}.bias"]),
        }
    head: Dict[str, Any] = {}
    if "classifier.0.weight" in sd:
        head["fc6"] = {
            "kernel": _linear_kernel(sd["classifier.0.weight"]),
            "bias": _f32(sd["classifier.0.bias"]),
        }
        head["fc7"] = {
            "kernel": _linear_kernel(sd["classifier.3.weight"]),
            "bias": _f32(sd["classifier.3.bias"]),
        }
    return {"backbone": backbone, "head": head}


def _convert_bn(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "scale": _f32(sd[f"{prefix}.weight"]),
        "bias": _f32(sd[f"{prefix}.bias"]),
        "mean": _f32(sd[f"{prefix}.running_mean"]),
        "var": _f32(sd[f"{prefix}.running_var"]),
    }


def _convert_bottleneck(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = {"kernel": _conv_kernel(sd[f"{prefix}.conv{i}.weight"])}
        out[f"bn{i}"] = _convert_bn(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample_conv"] = {
            "kernel": _conv_kernel(sd[f"{prefix}.downsample.0.weight"])
        }
        # torchvision names the BN inside downsample as index 1.
        out["downsample_bn"] = _convert_bn(sd, f"{prefix}.downsample.1")
    return out


def convert_resnet(
    state_dict: Mapping[str, Any], depth: int = 101
) -> Dict[str, Any]:
    """torchvision ResNet state dict -> {'backbone': .., 'head': ..}."""
    from scda_tpu.models.backbones.resnet import RESNET_DEPTHS

    sd = {k: v for k, v in state_dict.items()}
    blocks = RESNET_DEPTHS[depth]
    backbone: Dict[str, Any] = {
        "conv1": {"kernel": _conv_kernel(sd["conv1.weight"])},
        "bn1": _convert_bn(sd, "bn1"),
    }
    for li, n in enumerate(blocks[:3], start=1):
        stage: Dict[str, Any] = {}
        for bi in range(n):
            stage[f"block{bi}"] = _convert_bottleneck(sd, f"layer{li}.{bi}")
        backbone[f"layer{li}"] = stage
    head_stage: Dict[str, Any] = {}
    for bi in range(blocks[3]):
        head_stage[f"block{bi}"] = _convert_bottleneck(sd, f"layer4.{bi}")
    return {"backbone": backbone, "head": {"layer4": head_stage}}


def _merge(dst: Dict[str, Any], src: Mapping[str, Any], path: str = ""):
    """Recursively copy src leaves into dst, checking shapes."""
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"converted param {path}/{k} not in model params")
        if isinstance(v, Mapping):
            _merge(dst[k], v, f"{path}/{k}")
        else:
            have = np.shape(dst[k])
            want = np.shape(v)
            if have != want:
                raise ValueError(
                    f"shape mismatch at {path}/{k}: model {have}, torch {want}"
                )
            dst[k] = np.asarray(v, np.float32)


def load_pretrained_backbone(
    params: Dict[str, Any], checkpoint_path: str, backbone: str,
    allow_unsafe_pickle: bool = False,
) -> Dict[str, Any]:
    """Merge a torch ``.pth`` backbone checkpoint into initialised flax
    params (RPN/RCNN heads keep their fresh init — ref _init_modules).

    ``weights_only=True`` by default — see load_reference_checkpoint."""
    import torch

    try:
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
    except Exception as e:
        if not allow_unsafe_pickle:
            raise RuntimeError(
                f"{checkpoint_path} is not loadable with "
                "weights_only=True (it pickles non-tensor objects). "
                "If you trust this file, pass "
                "allow_unsafe_pickle=True / --allow_unsafe_pickle."
            ) from e
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    if backbone == "vgg16":
        converted = convert_vgg16(sd)
    elif backbone.startswith("resnet"):
        converted = convert_resnet(sd, int(backbone.replace("resnet", "")))
    else:
        raise ValueError(f"no converter for backbone {backbone!r}")

    out = jax_tree_to_mutable(params)
    _merge(out, converted)
    return out


def jax_tree_to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: jax_tree_to_mutable(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# FULL reference-layout detector checkpoints
# ---------------------------------------------------------------------------
#
# The reference trains/saves the whole detector under the
# jwyang-lineage module names (ref lib/model/faster_rcnn/faster_rcnn.py
# + vgg16.py/resnet.py):
#   RCNN_base.{i}.*            backbone (vgg features indices / resnet
#                              Sequential: 0=conv1 1=bn1 4..6=layer1..3)
#   RCNN_rpn.RPN_Conv.*        rpn 3x3 conv
#   RCNN_rpn.RPN_cls_score.*   rpn cls 1x1 — channels packed
#                              [bg x A, fg x A] (class-major; see
#                              proposal_layer.py:~70 `scores[:, A:]`)
#   RCNN_rpn.RPN_bbox_pred.*   rpn bbox 1x1 — channels a*4+d
#                              (anchor-major, same as ours)
#   RCNN_top.{i}.*             head (vgg classifier 0/3 = fc6/fc7;
#                              resnet: 0.{b} = layer4 blocks)
#   RCNN_cls_score.* / RCNN_bbox_pred.*   final linear heads
#
# Converting these lets a reference user evaluate a TRAINED reference
# .pth directly (`test_net --torch_checkpoint`); pair with
# model.pooling_mode=align_legacy for the reference kernel semantics.
# Our RPN lays channels out anchor-major (rpn.py: reshape (A, 2) /
# (A, 4)), so the cls conv's output channels permute c*A+a -> a*2+c;
# bbox channels and the per-class box head (cls*4+d) already agree.


def _permute_rpn_cls(kernel_oihw: np.ndarray, bias: np.ndarray,
                     num_anchors: int):
    """Reference [bg x A, fg x A] output channels -> our (A, 2) packing."""
    o = kernel_oihw.shape[0]
    assert o == 2 * num_anchors, (o, num_anchors)
    perm = np.asarray([c * num_anchors + a
                       for a in range(num_anchors) for c in range(2)])
    return kernel_oihw[perm], np.asarray(bias)[perm]


def convert_reference_detector(
    state_dict: Mapping[str, Any],
    backbone: str,
    num_anchors: int = 9,
) -> Dict[str, Any]:
    """jwyang/SCDA-lineage full-detector state dict -> our params tree
    ({'backbone','head','rpn','cls_score','bbox_pred'} subtrees)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    out: Dict[str, Any] = {}
    if backbone == "vgg16":
        backbone_p: Dict[str, Any] = {}
        for item in VGG16_LAYOUT:
            if item == "M":
                continue
            idx, _ = item
            backbone_p[f"conv{idx}"] = {
                "kernel": _conv_kernel(sd[f"RCNN_base.{idx}.weight"]),
                "bias": _f32(sd[f"RCNN_base.{idx}.bias"]),
            }
        out["backbone"] = backbone_p
        out["head"] = {
            "fc6": {"kernel": _linear_kernel(sd["RCNN_top.0.weight"]),
                    "bias": _f32(sd["RCNN_top.0.bias"])},
            "fc7": {"kernel": _linear_kernel(sd["RCNN_top.3.weight"]),
                    "bias": _f32(sd["RCNN_top.3.bias"])},
        }
    elif backbone.startswith("resnet"):
        from scda_tpu.models.backbones.resnet import RESNET_DEPTHS

        depth = int(backbone.replace("resnet", ""))
        blocks = RESNET_DEPTHS[depth]
        backbone_p = {
            "conv1": {"kernel": _conv_kernel(sd["RCNN_base.0.weight"])},
            "bn1": _convert_bn(sd, "RCNN_base.1"),
        }
        for li, n in enumerate(blocks[:3], start=1):
            seq = li + 3  # Sequential index: layer1 at 4, layer2 at 5...
            stage: Dict[str, Any] = {}
            for bi in range(n):
                stage[f"block{bi}"] = _convert_bottleneck(
                    sd, f"RCNN_base.{seq}.{bi}")
            backbone_p[f"layer{li}"] = stage
        out["backbone"] = backbone_p
        head_stage: Dict[str, Any] = {}
        for bi in range(blocks[3]):
            head_stage[f"block{bi}"] = _convert_bottleneck(
                sd, f"RCNN_top.0.{bi}")
        out["head"] = {"layer4": head_stage}
    else:
        raise ValueError(f"no reference converter for {backbone!r}")

    cls_k, cls_b = _permute_rpn_cls(
        np.asarray(sd["RCNN_rpn.RPN_cls_score.weight"], np.float32),
        np.asarray(sd["RCNN_rpn.RPN_cls_score.bias"], np.float32),
        num_anchors,
    )
    out["rpn"] = {
        "conv": {"kernel": _conv_kernel(sd["RCNN_rpn.RPN_Conv.weight"]),
                 "bias": _f32(sd["RCNN_rpn.RPN_Conv.bias"])},
        "cls_score": {"kernel": _conv_kernel(cls_k), "bias": cls_b},
        "bbox_pred": {
            "kernel": _conv_kernel(sd["RCNN_rpn.RPN_bbox_pred.weight"]),
            "bias": _f32(sd["RCNN_rpn.RPN_bbox_pred.bias"]),
        },
    }
    out["cls_score"] = {
        "kernel": _linear_kernel(sd["RCNN_cls_score.weight"]),
        "bias": _f32(sd["RCNN_cls_score.bias"]),
    }
    out["bbox_pred"] = {
        "kernel": _linear_kernel(sd["RCNN_bbox_pred.weight"]),
        "bias": _f32(sd["RCNN_bbox_pred.bias"]),
    }
    return out


def _conv_kernel_inv(k_hwio: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(k_hwio, np.float32), (3, 2, 0, 1))


def export_reference_detector(
    params: Mapping[str, Any],
    backbone: str,
    num_anchors: int = 9,
) -> Dict[str, np.ndarray]:
    """Our params tree -> jwyang/SCDA-layout state dict (numpy values).

    Inverse of :func:`convert_reference_detector` — lets the REFERENCE
    codebase's own test_net.py evaluate a model trained here (the
    strongest cross-framework fidelity check), or hands a checkpoint
    back to a torch user.  ``scripts/export_torch.py`` wraps this as a
    CLI writing the ``{'model': ...}`` payload the reference loads.
    """
    sd: Dict[str, np.ndarray] = {}
    if backbone == "vgg16":
        for item in VGG16_LAYOUT:
            if item == "M":
                continue
            idx, _ = item
            p = params["backbone"][f"conv{idx}"]
            sd[f"RCNN_base.{idx}.weight"] = _conv_kernel_inv(p["kernel"])
            sd[f"RCNN_base.{idx}.bias"] = _f32(p["bias"])
        for torch_i, ours in ((0, "fc6"), (3, "fc7")):
            p = params["head"][ours]
            sd[f"RCNN_top.{torch_i}.weight"] = np.transpose(
                _f32(p["kernel"]), (1, 0))
            sd[f"RCNN_top.{torch_i}.bias"] = _f32(p["bias"])
    elif backbone.startswith("resnet"):
        from scda_tpu.models.backbones.resnet import RESNET_DEPTHS

        depth = int(backbone.replace("resnet", ""))
        blocks = RESNET_DEPTHS[depth]

        def export_bn(dst_prefix, bn):
            sd[f"{dst_prefix}.weight"] = _f32(bn["scale"])
            sd[f"{dst_prefix}.bias"] = _f32(bn["bias"])
            sd[f"{dst_prefix}.running_mean"] = _f32(bn["mean"])
            sd[f"{dst_prefix}.running_var"] = _f32(bn["var"])

        def export_block(dst_prefix, blk):
            for i in (1, 2, 3):
                sd[f"{dst_prefix}.conv{i}.weight"] = _conv_kernel_inv(
                    blk[f"conv{i}"]["kernel"])
                export_bn(f"{dst_prefix}.bn{i}", blk[f"bn{i}"])
            if "downsample_conv" in blk:
                sd[f"{dst_prefix}.downsample.0.weight"] = _conv_kernel_inv(
                    blk["downsample_conv"]["kernel"])
                export_bn(f"{dst_prefix}.downsample.1",
                          blk["downsample_bn"])

        sd["RCNN_base.0.weight"] = _conv_kernel_inv(
            params["backbone"]["conv1"]["kernel"])
        export_bn("RCNN_base.1", params["backbone"]["bn1"])
        for li, n in enumerate(blocks[:3], start=1):
            for bi in range(n):
                export_block(f"RCNN_base.{li + 3}.{bi}",
                             params["backbone"][f"layer{li}"][f"block{bi}"])
        for bi in range(blocks[3]):
            export_block(f"RCNN_top.0.{bi}",
                         params["head"]["layer4"][f"block{bi}"])
    else:
        raise ValueError(f"no reference exporter for {backbone!r}")

    rpn = params["rpn"]
    sd["RCNN_rpn.RPN_Conv.weight"] = _conv_kernel_inv(rpn["conv"]["kernel"])
    sd["RCNN_rpn.RPN_Conv.bias"] = _f32(rpn["conv"]["bias"])
    # Inverse of the anchor-major -> class-major permutation.
    cls_k = _conv_kernel_inv(rpn["cls_score"]["kernel"])
    cls_b = _f32(rpn["cls_score"]["bias"])
    inv = np.asarray([a * 2 + c
                      for c in range(2) for a in range(num_anchors)])
    sd["RCNN_rpn.RPN_cls_score.weight"] = cls_k[inv]
    sd["RCNN_rpn.RPN_cls_score.bias"] = cls_b[inv]
    sd["RCNN_rpn.RPN_bbox_pred.weight"] = _conv_kernel_inv(
        rpn["bbox_pred"]["kernel"])
    sd["RCNN_rpn.RPN_bbox_pred.bias"] = _f32(rpn["bbox_pred"]["bias"])
    sd["RCNN_cls_score.weight"] = np.transpose(
        _f32(params["cls_score"]["kernel"]), (1, 0))
    sd["RCNN_cls_score.bias"] = _f32(params["cls_score"]["bias"])
    sd["RCNN_bbox_pred.weight"] = np.transpose(
        _f32(params["bbox_pred"]["kernel"]), (1, 0))
    sd["RCNN_bbox_pred.bias"] = _f32(params["bbox_pred"]["bias"])
    return sd


def load_reference_checkpoint(
    params: Dict[str, Any], checkpoint_path: str, backbone: str,
    num_anchors: int = 9, allow_unsafe_pickle: bool = False,
) -> Dict[str, Any]:
    """Load a full reference-trained ``.pth`` (the layout
    ``save_checkpoint`` writes, ref net_utils.py: ``{'model': ...}``)
    into initialised params — every detector weight is replaced.

    Loads with ``weights_only=True`` by default: reference-layout
    checkpoints are plain tensor/dict payloads, and these files come
    from outside this framework, so arbitrary-pickle execution is an
    attack vector.  ``allow_unsafe_pickle=True`` opts into the legacy
    full-pickle path for checkpoints that genuinely need it.
    """
    import torch

    try:
        payload = torch.load(checkpoint_path, map_location="cpu",
                             weights_only=True)
    except Exception as e:
        if not allow_unsafe_pickle:
            raise RuntimeError(
                f"{checkpoint_path} is not loadable with "
                "weights_only=True (it pickles non-tensor objects). "
                "If you trust this file, pass "
                "allow_unsafe_pickle=True / --allow_unsafe_pickle."
            ) from e
        payload = torch.load(checkpoint_path, map_location="cpu",
                             weights_only=False)
    sd = payload.get("model", payload) if isinstance(payload, dict) \
        else payload
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    converted = convert_reference_detector(sd, backbone, num_anchors)
    out = jax_tree_to_mutable(params)
    _merge(out, converted)
    return out
