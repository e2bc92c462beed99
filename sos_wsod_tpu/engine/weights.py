"""Pretrained-weight loading: detectron2/caffe2 pickle -> flax param trees.

Parity target: the reference loads torch/caffe weights through fvcore's
DetectionCheckpointer name-matching (detectron2/detectron2/checkpoint/
c2_model_loading.py). We implement the two concrete mappings the SoS pipeline
needs:
 - VGG16 WSL checkpoints / VGG_ILSVRC_16_layers_v1_d2.pkl
   (backbone.plainX.convY.*, roi_heads.box_head.fcY.*,
   roi_heads.box_predictor.{cls,det}.*, roi_heads.box_refinery_K.*)
 - caffe2 ImageNet R-50.pkl (conv1_w, res{s}_{b}_branch{1,2x}_{w,bn_s,bn_b})
Layout conversion: torch conv OIHW -> flax HWIO; torch FC (out, in) -> flax
(in, out); caffe2 affine BN scale/bias -> FrozenBN weight/bias with zero mean /
unit variance (caffe2 checkpoints carry folded statistics).
"""
from __future__ import annotations

import logging
import pickle
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def load_pkl(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("model", data)
    return {k: np.asarray(v) for k, v in blobs.items() if isinstance(v, np.ndarray) or hasattr(v, "shape")}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW -> HWIO


def _fc_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _fc6_w(w: np.ndarray, ph: int = 7, pw: int = 7) -> np.ndarray:
    """DAN fc1 weight for channels-last pooled input: torch flattens pooled
    ROIs in (c, h, w) order; the fused TPU pooler emits (h, w, c). Permute
    the input dimension accordingly (rows of w.T). Non-spatial fc1 weights
    (in_dim not divisible by ph*pw) pass through unpermuted."""
    out_dim, in_dim = w.shape
    if in_dim % (ph * pw) != 0:
        return _fc_w(w)
    c = in_dim // (ph * pw)
    # old index: ci*ph*pw + hi*pw + wi -> new index: (hi*pw + wi)*c + ci
    wt = w.reshape(out_dim, c, ph * pw).transpose(0, 2, 1).reshape(out_dim, in_dim)
    return np.ascontiguousarray(wt.T)


def vgg_wsl_param_tree(blobs: Dict[str, np.ndarray],
                       dan_channels_last: bool = True) -> Dict[str, Any]:
    """Map d2-WSL names to our MultiInputRCNN/GeneralizedRCNNWSL param tree.
    Unknown keys are skipped with a log line (like the reference's heuristic
    matcher reporting unused blobs).

    dan_channels_last: permute fc1 for the fused channels-last pooler (the
    MultiInputRCNN ROIPool default); pass False for NCHW-layout heads."""
    out: Dict[str, Any] = {}
    for key, v in blobs.items():
        k = key[len("backbone."):] if key.startswith("backbone.") else key
        parts = k.split(".")
        if parts[0].startswith("plain") and len(parts) == 3:
            stage, conv, kind = parts
            leaf = "kernel" if kind == "weight" else "bias"
            val = _conv_w(v) if kind == "weight" else v
            _set(out, ("backbone", stage, conv, leaf), val)
        elif key.startswith("roi_heads.box_head.fc"):
            _, _, fc, kind = key.split(".")
            leaf = "kernel" if kind == "weight" else "bias"
            if kind == "weight" and fc == "fc1" and dan_channels_last:
                val = _fc6_w(v)
            elif kind == "weight":
                val = _fc_w(v)
            else:
                val = v
            _set(out, ("roi_heads", "dan", fc, leaf), val)
        elif key.startswith("roi_heads.box_predictor."):
            _, _, name, kind = key.split(".")
            if name not in ("cls", "det"):
                logger.info("skip %s", key)
                continue
            leaf = "kernel" if kind == "weight" else "bias"
            val = _fc_w(v) if kind == "weight" else v
            _set(out, ("roi_heads", "wsddn", name, leaf), val)
        elif key.startswith("roi_heads.box_refinery_"):
            _, refinery, name, kind = key.split(".")
            leaf = "kernel" if kind == "weight" else "bias"
            val = _fc_w(v) if kind == "weight" else v
            _set(out, ("roi_heads", refinery, name, leaf), val)
        else:
            logger.info("unmatched checkpoint key: %s", key)
    return out


_BRANCH2 = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3"}


def resnet_c2_param_tree(blobs: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map caffe2 ImageNet ResNet blobs to our ResNet module tree
    (bottom_up names: stem/conv1, res{s}_block{b}/conv{i} + _norm)."""
    out: Dict[str, Any] = {}

    def put_norm(path, s, b):
        _set(out, path + ("weight",), s)
        _set(out, path + ("bias",), b)
        _set(out, path + ("running_mean",), np.zeros_like(b))
        _set(out, path + ("running_var",), np.ones_like(s))

    # stem
    if "conv1_w" in blobs:
        _set(out, ("stem", "conv1", "kernel"), _conv_w(blobs["conv1_w"]))
        put_norm(("stem", "conv1_norm"), blobs["res_conv1_bn_s"], blobs["res_conv1_bn_b"])
    for key, v in blobs.items():
        if not key.startswith("res") or key.startswith("res_conv1"):
            continue
        parts = key.split("_")
        if len(parts) < 4:
            continue
        stage = parts[0]            # res2..res5
        block = parts[1]            # 0..N
        branch = parts[2]           # branch1 / branch2a...
        rest = "_".join(parts[3:])  # w | bn_s | bn_b
        mod = f"{stage}_block{block}"
        if branch == "branch1":
            conv = "shortcut"
        elif branch in _BRANCH2:
            conv = _BRANCH2[branch]
        else:
            continue
        norm = f"{conv}_norm"
        if rest == "w":
            _set(out, (mod, conv, "kernel"), _conv_w(v))
        elif rest == "bn_s":
            b = blobs[key[:-1] + "b"]
            put_norm((mod, norm), v, b)
    return out


def merge_pretrained(params: Dict[str, Any], pretrained: Dict[str, Any], path=()) -> Dict[str, Any]:
    """Recursively overwrite matching leaves of ``params`` with ``pretrained``
    values (shape-checked); unmatched pretrained entries are reported."""
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out[k] = merge_pretrained(v, pretrained.get(k, {}), path + (k,))
        else:
            if k in pretrained:
                pv = np.asarray(pretrained[k])
                assert pv.shape == tuple(v.shape), (
                    f"shape mismatch at {'/'.join(path + (k,))}: "
                    f"{pv.shape} vs {tuple(v.shape)}"
                )
                out[k] = pv.astype(np.asarray(v).dtype)
            else:
                out[k] = v
    return out


def load_vgg_wsl_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    return merge_pretrained(params, vgg_wsl_param_tree(load_pkl(path)))


def load_resnet_imagenet_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Merge caffe2 R-50 ImageNet blobs into a GeneralizedRCNN param tree
    (backbone.bottom_up)."""
    tree = resnet_c2_param_tree(load_pkl(path))
    out = dict(params)
    bb = dict(params["backbone"])
    bb["bottom_up"] = merge_pretrained(params["backbone"]["bottom_up"], tree)
    out["backbone"] = bb
    return out


def _deconv_w(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def frcnn_param_tree(sd: Dict[str, np.ndarray],
                     box_head_channels_last: bool = True) -> Dict[str, Any]:
    """Map a detectron2 R50-FPN GeneralizedRCNN ``state_dict`` (torch names,
    as produced by the reference's stage-2/3 checkpoints — unbias/ubteacher/
    checkpoint/detection_checkpoint.py:10-113) onto our GeneralizedRCNN tree.

    Handles: ResNet bottom_up (stem/res{s}.{b} -> res{s}_block{b}), FPN
    lateral/output convs, RPN head, box_head fc1/fc2 (fc1 rows permuted for
    the channels-last pooled layout when ``box_head_channels_last``),
    box_predictor, cascade per-stage heads (box_head.{k} -> box_head_{k}) and
    the mask head (mask_fcn{i}/deconv/predictor). pixel_mean/std and anchor
    buffers are skipped (ours are config constants)."""
    out: Dict[str, Any] = {}
    for key, v in sd.items():
        v = np.asarray(v)
        parts = key.split(".")
        if key.startswith(("pixel_mean", "pixel_std")) or "anchor_generator" in key:
            continue
        if key.startswith("backbone.bottom_up."):
            rest = parts[2:]
            if rest[0] == "stem":
                # stem.conv1.weight | stem.conv1.norm.X
                if rest[2] == "weight" and len(rest) == 3:
                    _set(out, ("backbone", "bottom_up", "stem", "conv1", "kernel"), _conv_w(v))
                elif rest[2] == "norm":
                    _set(out, ("backbone", "bottom_up", "stem", "conv1_norm", rest[3]), v)
                continue
            if rest[0].startswith("res"):
                # res2.0.conv1.weight | res2.0.conv1.norm.X | res2.0.shortcut[.norm].X
                stage, block, conv = rest[0], rest[1], rest[2]
                mod = f"{stage}_block{block}"
                if rest[-1] == "weight" and rest[-2] == conv:
                    _set(out, ("backbone", "bottom_up", mod, conv, "kernel"), _conv_w(v))
                elif "norm" in rest:
                    _set(out, ("backbone", "bottom_up", mod, f"{conv}_norm", rest[-1]), v)
                continue
            logger.info("unmatched checkpoint key: %s", key)
        elif parts[0] == "backbone" and parts[1].startswith(("fpn_lateral", "fpn_output")):
            leaf = "kernel" if parts[2] == "weight" else "bias"
            val = _conv_w(v) if parts[2] == "weight" else v
            _set(out, ("backbone", "fpn", parts[1], leaf), val)
        elif key.startswith("proposal_generator.rpn_head."):
            name, kind = parts[2], parts[3]
            leaf = "kernel" if kind == "weight" else "bias"
            val = _conv_w(v) if kind == "weight" else v
            _set(out, ("proposal_generator", "head", name, leaf), val)
        elif key.startswith("roi_heads.box_head"):
            # box_head.fc1.weight | cascade: box_head.0.fc1.weight
            rest = parts[2:]
            head = "box_head"
            if rest[0].isdigit():
                head = f"box_head_{rest[0]}"
                rest = rest[1:]
            name, kind = rest[0], rest[1]
            leaf = "kernel" if kind == "weight" else "bias"
            if kind == "weight" and name.startswith("fc"):
                first_fc = name == "fc1"
                val = _fc6_w(v) if (first_fc and box_head_channels_last) else _fc_w(v)
            elif kind == "weight" and name.startswith("conv"):
                val = _conv_w(v)
            elif kind == "weight":
                val = _fc_w(v)
            else:
                val = v
            _set(out, ("roi_heads", head, name, leaf), val)
        elif key.startswith("roi_heads.box_predictor"):
            rest = parts[2:]
            pred = "box_predictor"
            if rest[0].isdigit():
                pred = f"box_predictor_{rest[0]}"
                rest = rest[1:]
            name, kind = rest[0], rest[1]
            leaf = "kernel" if kind == "weight" else "bias"
            val = _fc_w(v) if kind == "weight" else v
            _set(out, ("roi_heads", pred, name, leaf), val)
        elif key.startswith("roi_heads.mask_head."):
            name, kind = parts[2], parts[3]
            leaf = "kernel" if kind == "weight" else "bias"
            if kind == "weight" and name == "deconv":
                val = _deconv_w(v)
            elif kind == "weight":
                val = _conv_w(v)
            else:
                val = v
            _set(out, ("roi_heads", "mask_head", name, leaf), val)
        else:
            logger.info("unmatched checkpoint key: %s", key)
    return out


def ubteacher_state_dicts(ckpt: Any):
    """Split an ubteacher ``EnsembleTSModel`` checkpoint (or its ``model``
    state_dict) into (student_sd, teacher_sd) torch-name state_dicts —
    parity role: tools/convert2detectron2.py:14-24 key-prefix extraction."""
    from .torch_pickle import state_dict_to_numpy

    flat = state_dict_to_numpy(ckpt)
    student = {k[len("modelStudent."):]: v for k, v in flat.items()
               if k.startswith("modelStudent.")}
    teacher = {k[len("modelTeacher."):]: v for k, v in flat.items()
               if k.startswith("modelTeacher.")}
    if not student and not teacher:  # plain (non-ensemble) checkpoint
        student = flat
    return student, teacher


def load_frcnn_torch_weights(params: Dict[str, Any], path: str,
                             role: str = "student") -> Dict[str, Any]:
    """Load a reference stage-2/3 ``.pth`` (plain d2 or ubteacher ensemble)
    into our GeneralizedRCNN param tree, torch-free."""
    from .torch_pickle import torch_load

    student, teacher = ubteacher_state_dicts(torch_load(path))
    sd = teacher if role == "teacher" else student
    if not sd:
        raise ValueError(f"checkpoint {path} has no '{role}' weights")
    return merge_pretrained(params, frcnn_param_tree(sd))


def load_vgg_wsl_torch_checkpoint(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load a released stage-1 OICR+ model checkpoint (torch .pth with d2-WSL
    names: backbone.plainX, roi_heads.box_head.fcY, roi_heads.box_predictor.
    {cls,det}, roi_heads.box_refinery_K) into MultiInputRCNN params,
    torch-free. Covers SURVEY §7 Milestone A released-checkpoint inference."""
    from .torch_pickle import state_dict_to_numpy, torch_load

    sd = state_dict_to_numpy(torch_load(path))
    return merge_pretrained(params, vgg_wsl_param_tree(sd))


# torchvision vgg16 "features" conv indices per stage (the reference's
# convert_vgg.py maps the same caffe/torch layer order)
_TV_VGG16_LAYOUT = [
    ("plain1", (0, 2)),
    ("plain2", (5, 7)),
    ("plain3", (10, 12, 14)),
    ("plain4", (17, 19, 21)),
    ("plain5", (24, 26, 28)),
]


def torchvision_vgg16_param_tree(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a torchvision ``vgg16`` state_dict (``features.N.{weight,bias}``)
    to our VGG16 backbone tree (parity role: uwsod/projects/WSL/tools/
    convert_vgg.py). Classifier FCs map to the DAN (fc1/fc2) when present.

    NOTE: torchvision VGG16 is trained on RGB/255-normalised inputs while the
    reference caffe weights expect BGR mean-subtracted pixels — converting
    weights does NOT convert the preprocessing convention; prefer the caffe
    pkl for parity runs."""
    out: Dict[str, Any] = {}
    for stage, idxs in _TV_VGG16_LAYOUT:
        for j, li in enumerate(idxs, start=1):
            w = state_dict.get(f"features.{li}.weight")
            b = state_dict.get(f"features.{li}.bias")
            if w is None:
                logger.info("missing torchvision key features.%d.weight", li)
                continue
            _set(out, ("backbone", stage, f"conv{j}", "kernel"),
                 _conv_w(np.asarray(w)))
            if b is not None:
                _set(out, ("backbone", stage, f"conv{j}", "bias"),
                     np.asarray(b))
    for j, li in enumerate((0, 3), start=1):
        w = state_dict.get(f"classifier.{li}.weight")
        b = state_dict.get(f"classifier.{li}.bias")
        if w is not None:
            _set(out, ("roi_heads", "dan", f"fc{j}", "kernel"),
                 _fc6_w(np.asarray(w)) if j == 1 else _fc_w(np.asarray(w)))
        if b is not None:
            _set(out, ("roi_heads", "dan", f"fc{j}", "bias"), np.asarray(b))
    return out
