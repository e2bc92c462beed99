"""Deterministic inputs + weights for the OICR+ model-level golden.

Shared between tools/make_reference_goldens.py (which runs the reference's
composed forward in plain torch + the compiled reference pooling kernel and
records the outputs) and tests/test_reference_goldens.py (which loads the
SAME weights into our jitted MultiInputRCNN and compares). Keeping the
weights out of the .npz keeps the committed golden small (~1 MB instead of
~200 MB of fc6 weights); determinism rests on numpy's RandomState, whose
bit-stream is stable across platforms and versions by API contract.

Weight keys use the d2-WSL state-dict names that
sos_wsod_tpu/engine/weights.py:vgg_wsl_param_tree consumes, so both sides
load identical tensors. Reference graph being anchored:
uwsod/detectron2/modeling/meta_arch/rcnn_multi.py:210-292 (inference path)
+ wsl/modeling/roi_heads/fast_rcnn_oicr.py:674-736 (branch ensemble).
"""
from __future__ import annotations

import numpy as np

NUM_CLASSES = 20
REFINE_K = 4
H, W, P = 96, 128, 40
PIXEL_MEAN = (103.939, 116.779, 123.68)  # BGR, voc07_oicr_plus.yaml

# (name, cout, n_conv, dilation, pool_stride) — dilated VGG16
# (wsl/modeling/backbone/vgg.py:125-233: plain1-3 pool s2, plain4 pool 2x2
# s1 VALID — shrinks the map by 1 — plain5 dilation 2, no pool)
STAGES = (
    ("plain1", 64, 2, 1, 2),
    ("plain2", 128, 2, 1, 2),
    ("plain3", 256, 3, 1, 2),
    ("plain4", 512, 3, 1, 1),
    ("plain5", 512, 3, 2, 0),
)


def _mixed_rois(rng, n, img_h, img_w):
    """Same edge/tiny/full cases as make_reference_goldens.mixed_rois, then
    CLIPPED to the image — the pipeline contract both sides share: d2's
    transform_proposals clips proposals to the image before they reach the
    model (detectron2/data/detection_utils.py), and our data layer does the
    same, so the composed-model golden must not contain boxes the real
    pipeline can never produce. (ops/roi_pool.py's table formulation
    documents it requires roughly-clipped boxes; unclipped-overhang KERNEL
    behavior is covered separately by the roi_loop_pool golden, whose
    feature extent is large enough for the raw mixed_rois.)"""
    x1 = rng.uniform(0, img_w - 10, n)
    y1 = rng.uniform(0, img_h - 10, n)
    x2 = np.minimum(x1 + rng.uniform(2, img_w / 2, n), img_w)
    y2 = np.minimum(y1 + rng.uniform(2, img_h / 2, n), img_h)
    rois = np.stack([np.zeros(n), x1, y1, x2, y2], 1)
    rois[0] = [0, 0, 0, img_w, img_h]
    rois[1] = [0, 5, 5, 6, 6]
    rois[2] = [0, img_w - 4, img_h - 4, img_w, img_w]
    rois[3] = [0, 11.5, 3.5, 200.49, 100.51]  # .5 rounding edges
    rois[:, 1] = np.clip(rois[:, 1], 0, img_w)
    rois[:, 2] = np.clip(rois[:, 2], 0, img_h)
    rois[:, 3] = np.clip(rois[:, 3], 0, img_w)
    rois[:, 4] = np.clip(rois[:, 4], 0, img_h)
    return np.ascontiguousarray(rois, np.float32)


def build_case():
    """Returns (image (H,W,3) BGR raw, rois (P,5) [batch_ind,x1,y1,x2,y2],
    objectness (P,), blobs {d2-WSL name -> np.ndarray})."""
    rng = np.random.RandomState(23)
    image = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)

    blobs = {}
    cin = 3
    for name, cout, n, _dil, _ps in STAGES:
        for i in range(1, n + 1):
            # msra/fan_out-scale random weights keep activations sane
            std = float(np.sqrt(2.0 / (9.0 * cout)))
            blobs[f"backbone.{name}.conv{i}.weight"] = (
                rng.randn(cout, cin, 3, 3) * std).astype(np.float32)
            blobs[f"backbone.{name}.conv{i}.bias"] = (
                rng.randn(cout) * 0.01).astype(np.float32)
            cin = cout

    rois = _mixed_rois(rng, P, H, W)
    objectness = rng.uniform(0, 1, P).astype(np.float32)

    def lin(name, out_dim, in_dim, std, bias):
        blobs[name + ".weight"] = (
            rng.randn(out_dim, in_dim) * std).astype(np.float32)
        blobs[name + ".bias"] = np.full(out_dim, bias, np.float32)

    lin("roi_heads.box_head.fc1", 4096, 512 * 49, 0.005, 0.1)
    lin("roi_heads.box_head.fc2", 4096, 4096, 0.005, 0.1)
    for k in range(REFINE_K):
        lin(f"roi_heads.box_refinery_{k}.cls_score",
            NUM_CLASSES + 1, 4096, 0.01, 0.0)
        lin(f"roi_heads.box_refinery_{k}.bbox_pred",
            NUM_CLASSES * 4, 4096, 0.001, 0.0)
    return image, rois, objectness, blobs


# ------------------------------------------------- composed TRAINING golden
H2, W2 = 80, 112          # second scale (both multiples of 16 like H, W)
GT_CLASSES = (1, 7, 11)   # image-level present classes


def build_train_case():
    """Inputs for the composed stage-1 TRAINING golden: the 4 synchronized
    views (2 scales x {id, hflip}) the reference's OICRPlusHeads trains on
    (roi_heads_oicrplus.py:190-425), plus WSDDN MIL head weights on top of
    ``build_case``'s backbone/DAN/refinery blobs.

    Returns (image (H,W,3) BGR raw scale 1, image2 (H2,W2,3) scale 2,
    boxes4 (4,P,4) per-view XYXY [s1, s1f, s2, s2f], objectness (P,),
    gt_oh (K,), blobs). The scale-2 image is an independent random draw —
    the training graph runs each view through the same ops regardless of
    pixel correspondence, and an independent image avoids baking one
    resize algorithm into the golden."""
    image, rois, objectness, blobs = build_case()
    rng = np.random.RandomState(57)
    image2 = rng.uniform(0, 255, (H2, W2, 3)).astype(np.float32)
    for name in ("cls", "det"):
        # xavier_uniform bound for (out=K, in=4096)
        bound = float(np.sqrt(6.0 / (NUM_CLASSES + 4096)))
        blobs[f"roi_heads.box_predictor.{name}.weight"] = rng.uniform(
            -bound, bound, (NUM_CLASSES, 4096)).astype(np.float32)
        blobs[f"roi_heads.box_predictor.{name}.bias"] = np.zeros(
            NUM_CLASSES, np.float32)

    # fresh interior boxes (NOT build_case's mixed_rois): proposals whose
    # pooled window falls outside the 11x15 feature map pool to all-zeros,
    # and several zero-feature proposals tie BITWISE in the WSDDN scores —
    # torch.topk and lax.top_k then break the mining top-1 differently and
    # the golden would anchor an arbitrary tie. Interior boxes with >= 12 px
    # extents keep every pooled feature distinct.
    b1 = np.empty((P, 4), np.float32)
    x1 = rng.uniform(0, W - 28, P)
    y1 = rng.uniform(0, H - 28, P)
    b1[:, 0], b1[:, 1] = x1, y1
    b1[:, 2] = np.minimum(x1 + rng.uniform(12, W / 2, P), W - 12)
    b1[:, 3] = np.minimum(y1 + rng.uniform(12, H / 2, P), H - 12)
    b1[0] = [0, 0, W - 12, H - 12]  # near-full extent
    sx, sy = W2 / W, H2 / H
    b2 = b1 * np.array([sx, sy, sx, sy], np.float32)
    b1f = b1.copy()
    b1f[:, [0, 2]] = W - b1[:, [2, 0]]
    b2f = b2.copy()
    b2f[:, [0, 2]] = W2 - b2[:, [2, 0]]
    boxes4 = np.stack([b1, b1f, b2, b2f]).astype(np.float32)

    gt_oh = np.zeros(NUM_CLASSES, np.float32)
    gt_oh[list(GT_CLASSES)] = 1.0
    return image, image2, boxes4, objectness, gt_oh, blobs
