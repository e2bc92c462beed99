"""Tests for the PCL and CMIL ROI heads (clustering semantics + training/
inference smoke with gradient flow)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.heads.pcl import (
    PCLROIHead, get_graph_centers, get_proposal_clusters, pcl_targets_np,
    FG_THRESH, BG_THRESH,
)
from sos_wsod_tpu.models.heads.cmil import CMILROIHead


def _two_cluster_scene():
    """Two well-separated groups of overlapping boxes; class 0 present.
    Groups are large enough that the greedy center loop (which stops when
    <= 5 candidates remain, pcl.py:117-122) emits one center per group."""
    base1 = np.array([10, 10, 50, 50], np.float32)
    base2 = np.array([100, 100, 140, 140], np.float32)
    g1 = np.stack([base1 + 2 * i for i in range(12)])
    g2 = np.stack([base2 + 2 * i for i in range(12)])
    far = np.array([[200, 5, 220, 25]], np.float32)  # low-prob straggler
    boxes = np.vstack([g1, g2, far]).astype(np.float32)
    probs = np.concatenate([
        np.linspace(0.90, 0.88, 12), np.linspace(0.899, 0.881, 12), [0.01]
    ]).astype(np.float32)
    return boxes, probs


def test_graph_centers_two_clusters():
    boxes, probs = _two_cluster_scene()
    cls_prob = np.stack([probs, 1 - probs], 1)
    im_labels = np.array([1, 0], np.float32)
    gt_boxes, gt_classes, gt_scores = get_graph_centers(boxes, cls_prob, im_labels)
    assert gt_boxes.shape[0] >= 2
    assert np.all(gt_classes == 1)  # 1-based class ids
    # centers are high-probability members, ordered by descending score
    assert np.all(gt_scores > 0.5)
    assert np.all(np.diff(gt_scores) <= 1e-6)
    # the low-probability straggler never becomes a center
    assert not np.any(np.all(gt_boxes == np.array([200, 5, 220, 25]), axis=1))


def test_proposal_clusters_labels_and_weights():
    gt_boxes = np.array([[10, 10, 50, 50], [100, 100, 140, 140]], np.float32)
    gt_classes = np.array([3, 5], np.int32)
    gt_scores = np.array([0.9, 0.8], np.float32)
    rois = np.array([
        [11, 11, 51, 51],      # IoU ~0.9 with center 0 -> fg class 3
        [100, 100, 140, 120],  # IoU 0.5 with center 1 -> fg class 5
        [60, 60, 80, 80],      # IoU 0 with both -> ignored (weight 0)
        [10, 10, 50, 36],      # IoU ~0.65 with center 0 -> fg class 3
    ], np.float32)
    cls_prob_new = np.full((4, 7), 0.3, np.float32)
    labels, w, assign, pc_labels, pc_probs, pc_count, img_w = \
        get_proposal_clusters(rois, gt_boxes, gt_classes, gt_scores, cls_prob_new)
    assert labels.tolist() == [3, 5, 0, 3]
    assert w[2] == 0.0 and w[0] == pytest.approx(0.9)
    assert assign[2] == -1
    assert pc_count.tolist() == [2.0, 1.0]
    # pc_probs = mean prob of member proposals at the center's class
    assert pc_probs[0] == pytest.approx(0.3)
    assert img_w[0] == pytest.approx(1.8)  # 0.9 + 0.9


def test_pcl_targets_padding_and_empty():
    boxes, probs = _two_cluster_scene()
    n = boxes.shape[0]
    r = n + 10
    pad_boxes = np.zeros((r, 4), np.float32)
    pad_boxes[:n] = boxes
    cls_prob = np.zeros((r, 2), np.float32)
    cls_prob[:n] = np.stack([probs, 1 - probs], 1)
    valid = np.zeros(r, bool)
    valid[:n] = True
    new = np.full((r, 3), 1 / 3, np.float32)
    out = pcl_targets_np(pad_boxes, cls_prob, np.array([1, 0], np.float32),
                         new, valid, max_pc=10)
    labels, w, assign, pc_labels, pc_probs, pc_count, img_w, im_real = out
    assert labels.shape == (r,) and pc_labels.shape == (10,)
    assert np.all(w[n:] == 0.0)          # padded rows contribute nothing
    assert im_real.tolist()[:1] == [1.0]  # bg slot prepended
    # no present classes -> all-zero targets
    out0 = pcl_targets_np(pad_boxes, cls_prob, np.array([0, 0], np.float32),
                          new, valid, max_pc=10)
    assert np.all(out0[1] == 0)


def _head_inputs(rng, p=32, classes=4, ch=8):
    pooled = jnp.asarray(rng.rand(p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * 80
    wh = rng.rand(p, 2) * 40 + 10
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    objectness = jnp.asarray(rng.rand(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 4)
    gt_oh = jnp.zeros(classes).at[jnp.asarray([0, 2])].set(1.0)
    return pooled, boxes, objectness, valid, gt_oh


def test_pcl_head_train_and_grad():
    rng = np.random.RandomState(0)
    pooled, boxes, objectness, valid, gt_oh = _head_inputs(rng)
    head = PCLROIHead(num_classes=4, refine_k=2, dan_dims=(64, 64))
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, method=head.losses)

    def loss_fn(p):
        losses = head.apply(p, pooled, boxes, objectness, valid, gt_oh,
                            method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_cls", "loss_cls_r0", "loss_cls_r1"}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.abs(g).max() > 0 for g in leaves)


def test_pcl_head_inference():
    rng = np.random.RandomState(1)
    pooled, boxes, objectness, valid, gt_oh = _head_inputs(rng)
    head = PCLROIHead(num_classes=4, refine_k=2, dan_dims=(64, 64))
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, method=head.losses)
    probs, pred_boxes = head.apply(params, pooled, boxes, objectness, valid,
                                   method=head.predict)
    assert probs.shape == (32, 5)
    assert pred_boxes.shape == (32, 16)
    # bg rolled to last column: rows still sum to 1
    np.testing.assert_allclose(np.asarray(probs.sum(1)), 1.0, rtol=1e-5)


def test_cmil_head_train_and_grad():
    rng = np.random.RandomState(2)
    pooled, boxes, objectness, valid, gt_oh = _head_inputs(rng)
    head = CMILROIHead(num_classes=4, refine_k=2, dan_dims=(64, 64),
                       size_epoch=100, max_iter=2000)
    cur = jnp.asarray(150, jnp.int32)
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cur, method=head.losses)

    def loss_fn(p):
        losses = head.apply(p, pooled, boxes, objectness, valid, gt_oh, cur,
                            method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_cls", "loss_cls_r0", "loss_cls_r1"}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.abs(g).max() > 0 for g in leaves)


def test_cmil_head_inference():
    rng = np.random.RandomState(3)
    pooled, boxes, objectness, valid, gt_oh = _head_inputs(rng)
    head = CMILROIHead(num_classes=4, refine_k=3, dan_dims=(64, 64))
    cur = jnp.asarray(0, jnp.int32)
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cur, method=head.losses)
    probs, pred_boxes = head.apply(params, pooled, boxes, objectness, valid,
                                   method=head.predict)
    assert probs.shape == (32, 5)
    assert pred_boxes.shape == (32, 16)
