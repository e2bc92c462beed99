"""Tests for the ROILabel op (seed selection, assignment, sampling caps)."""
import numpy as np
import jax
import jax.numpy as jnp

from sos_wsod_tpu.ops.roi_label import roi_label


def _iou(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None, :] - inter)


def _scene():
    """Boxes in two spatial groups; class 0 peaks in group A, class 1 in B."""
    a = np.array([[10, 10, 50, 50], [12, 12, 52, 52], [14, 14, 54, 54]], np.float32)
    b = np.array([[100, 100, 140, 140], [98, 98, 138, 138]], np.float32)
    mid = np.array([[30, 30, 80, 80]], np.float32)  # IoU ~0.11 with seed 0
    boxes = np.vstack([a, b, mid])
    scores = np.array([
        [0.9, 0.1],
        [0.5, 0.1],
        [0.4, 0.1],
        [0.1, 0.8],
        [0.1, 0.6],
        [0.2, 0.2],
    ], np.float32)
    return boxes, scores


def test_roi_label_assignment():
    boxes, scores = _scene()
    iou = jnp.asarray(_iou(boxes, boxes))
    labels = jnp.asarray([1.0, 1.0])
    valid = jnp.ones(6, bool)
    rl, rw = roi_label(jnp.asarray(scores), iou, labels, valid,
                       jax.random.PRNGKey(0), top_k=1,
                       fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.05,
                       num_pos=32, num_neg=96)
    rl = np.asarray(rl)
    rw = np.asarray(rw)
    # group A rois -> class 0 (seed = box 0), group B -> class 1 (seed = box 3)
    assert rl[0] == 0 and rl[1] == 0 and rl[2] == 0
    assert rl[3] == 1 and rl[4] == 1
    # the straggler has IoU < fg but >= bg_lo with a seed -> background (C=2)
    assert rl[5] == 2
    # fg weights = seed score (no class_weights given)
    assert rw[0] == np.float32(0.9) and rw[3] == np.float32(0.8)


def test_roi_label_class_weights_and_absent_class():
    boxes, scores = _scene()
    iou = jnp.asarray(_iou(boxes, boxes))
    labels = jnp.asarray([1.0, 0.0])   # class 1 absent -> no class-1 seeds
    valid = jnp.ones(6, bool)
    cw = jnp.asarray([0.77, 0.33])
    rl, rw = roi_label(jnp.asarray(scores), iou, labels, valid,
                       jax.random.PRNGKey(0), class_weights=cw, top_k=1,
                       bg_thresh_lo=0.0, num_pos=32, num_neg=96)
    rl = np.asarray(rl)
    rw = np.asarray(rw)
    assert np.all(rl[:3] == 0)
    assert rw[0] == np.float32(0.77)      # CW[0], not the seed score
    # group B rois have ~0 IoU with the only (class-0) seed -> background
    assert rl[3] == 2 and rl[4] == 2


def test_roi_label_caps():
    """With num_pos=0 the kernel still accepts one fg (cap checked before
    increment); later fg candidates get weight 0 but keep their class."""
    boxes, scores = _scene()
    iou = jnp.asarray(_iou(boxes, boxes))
    labels = jnp.asarray([1.0, 1.0])
    valid = jnp.ones(6, bool)
    rl, rw = roi_label(jnp.asarray(scores), iou, labels, valid,
                       jax.random.PRNGKey(3), top_k=1,
                       num_pos=0, num_neg=0, bg_thresh_lo=0.05)
    rl = np.asarray(rl)
    rw = np.asarray(rw)
    fg_weighted = np.sum((rw > 0) & (rl < 2))
    assert fg_weighted == 1  # exactly num_pos + 1
    # capped fg rois keep their assigned class with zero weight
    assert np.all(rl[:3] == 0) and np.all(rl[3:5] == 1)


def test_roi_label_padding():
    boxes, scores = _scene()
    r = 10
    pb = np.zeros((r, 4), np.float32)
    pb[:6] = boxes
    ps = np.zeros((r, 2), np.float32)
    ps[:6] = scores
    iou = jnp.asarray(_iou(pb, pb))
    valid = jnp.asarray(np.arange(r) < 6)
    rl, rw = roi_label(jnp.asarray(ps), iou, jnp.asarray([1.0, 1.0]), valid,
                       jax.random.PRNGKey(0), top_k=1, bg_thresh_lo=0.05)
    assert np.all(np.asarray(rw)[6:] == 0.0)
