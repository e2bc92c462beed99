"""Pure-numpy oracles implementing the reference kernels' documented semantics.

These re-derive the torchvision/detectron2 behaviors from their specifications
(see docstrings in sos_wsod_tpu.ops.*) as slow nested loops, and serve as the
parity targets for the XLA/Pallas implementations.
"""
import math

import numpy as np


def roi_pool_np(feat_chw, boxes, spatial_scale, ph_out, pw_out):
    """torchvision roi_pool semantics. feat (C,H,W), boxes (P,4) -> (P,C,PH,PW)."""
    c, h, w = feat_chw.shape
    p = boxes.shape[0]
    out = np.zeros((p, c, ph_out, pw_out), dtype=feat_chw.dtype)

    def rnd(v):  # C round(): half away from zero; coords are >= 0 here
        return int(math.floor(v + 0.5))

    for i in range(p):
        x1, y1, x2, y2 = boxes[i]
        rs_w, rs_h = rnd(x1 * spatial_scale), rnd(y1 * spatial_scale)
        re_w, re_h = rnd(x2 * spatial_scale), rnd(y2 * spatial_scale)
        roi_w = max(re_w - rs_w + 1, 1)
        roi_h = max(re_h - rs_h + 1, 1)
        # Exact rational bin boundaries (torchvision computes these in f32; the
        # two agree except within 1 ULP of integer boundaries).
        for ph in range(ph_out):
            hs = min(max(ph * roi_h // ph_out + rs_h, 0), h)
            he = min(max(-((ph + 1) * roi_h // -ph_out) + rs_h, 0), h)
            for pw in range(pw_out):
                ws = min(max(pw * roi_w // pw_out + rs_w, 0), w)
                we = min(max(-((pw + 1) * roi_w // -pw_out) + rs_w, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[i, :, ph, pw] = feat_chw[:, hs:he, ws:we].max(axis=(1, 2))
    return out


def roi_align_np(feat_chw, boxes, spatial_scale, ph_out, pw_out, sampling_ratio, aligned):
    """detectron2 ROIAlign semantics. feat (C,H,W) -> (P,C,PH,PW)."""
    c, h, w = feat_chw.shape
    p = boxes.shape[0]
    out = np.zeros((p, c, ph_out, pw_out), dtype=np.float32)
    offset = 0.5 if aligned else 0.0

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y, x = max(y, 0.0), max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= h - 1:
            y_low = y_high = h - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= w - 1:
            x_low = x_high = w - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1.0 - ly, 1.0 - lx
        return (
            hy * hx * feat_chw[:, y_low, x_low]
            + hy * lx * feat_chw[:, y_low, x_high]
            + ly * hx * feat_chw[:, y_high, x_low]
            + ly * lx * feat_chw[:, y_high, x_high]
        )

    for i in range(p):
        sx1 = boxes[i, 0] * spatial_scale - offset
        sy1 = boxes[i, 1] * spatial_scale - offset
        sx2 = boxes[i, 2] * spatial_scale - offset
        sy2 = boxes[i, 3] * spatial_scale - offset
        roi_w, roi_h = sx2 - sx1, sy2 - sy1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / ph_out, roi_w / pw_out
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / ph_out))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / pw_out))
        gh, gw = max(gh, 1), max(gw, 1)
        count = gh * gw
        for ph in range(ph_out):
            for pw in range(pw_out):
                acc = np.zeros(c, np.float32)
                for iy in range(gh):
                    y = sy1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        x = sx1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear(y, x)
                out[i, :, ph, pw] = acc / count
    return out


def nms_np(boxes, scores, iou_threshold):
    """torchvision nms: greedy, suppress iou > threshold. Returns keep mask."""
    n = boxes.shape[0]
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(n, dtype=bool)
    suppressed = np.zeros(n, dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for _i in range(n):
        i = order[_i]
        if suppressed[i]:
            continue
        keep[i] = True
        for _j in range(_i + 1, n):
            j = order[_j]
            if suppressed[j]:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            union = areas[i] + areas[j] - inter
            iou = inter / union if union > 0 and inter > 0 else 0.0
            if iou > iou_threshold:
                suppressed[j] = True
    return keep


def matcher_np(quality, thresholds, labels):
    """d2 Matcher semantics (no low-quality matches). quality (M,N)."""
    m, n = quality.shape
    if m == 0:
        return np.zeros(n, np.int64), np.full(n, labels[0], np.int8)
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0)
    match_labels = np.ones(n, np.int8)
    th = [-np.inf] + list(thresholds) + [np.inf]
    for lab, lo, hi in zip(labels, th[:-1], th[1:]):
        band = (matched_vals >= lo) & (matched_vals < hi)
        match_labels[band] = lab
    return matches, match_labels
