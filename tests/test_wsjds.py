"""Tests for the ASPP segmentation head and the WSJDS joint head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.heads.aspp import (
    ASPPHead, constraint_loss, seg_targets_from_cpg, sem_seg_loss)
from sos_wsod_tpu.models.heads.wsjds import WSJDSROIHead, crop_instance_masks


def test_seg_targets_from_cpg():
    k, h, w = 3, 4, 4
    cpgs = np.zeros((k, h, w), np.float32)
    cpgs[0, :2, :2] = 0.5       # pos block for class 0
    cpgs[0, 2:, 2:] = 0.05      # ignore band (0.005 <= x < 0.1)
    gt_oh = jnp.asarray([1.0, 1.0, 0.0])
    preds = jnp.asarray([0.9, 0.2, 0.9])   # class 1 below tau
    t, wgt = seg_targets_from_cpg(jnp.asarray(cpgs), gt_oh, preds)
    t = np.asarray(t)
    wgt = np.asarray(wgt)
    assert np.all(t[0, :2, :2] == 1.0)
    np.testing.assert_allclose(wgt[0, :2, :2], 1.0 / 4)       # 4 pos pixels
    assert np.all(wgt[0, 2:, 2:] == 0.0)                       # ignore band
    # class 1: below tau -> everything ignored
    assert np.all(wgt[1] == 0.0)
    # class 2 absent -> all negative with weight 1/(h*w)
    assert np.all(t[2] == 0.0)
    np.testing.assert_allclose(wgt[2], 1.0 / (h * w))


def test_sem_seg_loss_ignore_and_balance():
    logits = jnp.zeros((2, 2, 1))
    targets = jnp.asarray([[[1.0], [0.0]], [[0.0], [0.0]]])
    weights = jnp.asarray([[[1.0], [1.0]], [[0.0], [0.0]]])
    # BCE at logit 0 is log(2) per weighted pixel
    loss = sem_seg_loss(logits, targets, weights)
    assert float(loss) == pytest.approx(2 * np.log(2), rel=1e-5)


def test_constraint_loss_clips_large():
    x = jnp.full((1, 2, 2), -40.0)  # log(sigmoid(sigmoid(-40))) ~ log(0.5)
    p = jnp.ones((1, 2, 2))
    w = jnp.ones((1, 2, 2))
    base = float(constraint_loss(x, p, w))
    assert np.isfinite(base)
    # per-entry values > 1000 are zeroed
    big = float(constraint_loss(x, p, w * 1e6))
    assert big == 0.0


def test_aspp_head_shapes():
    head = ASPPHead(num_classes=4, conv_dims=(16, 16))
    feats = jnp.asarray(np.random.RandomState(0).rand(8, 8, 12), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(params, feats)
    assert out.shape == (8, 8, 4)


def _wsjds_inputs(rng, p=12, classes=3, ch=8, imhw=24, fhw=6):
    pooled = jnp.asarray(rng.rand(p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * (imhw - 10)
    wh = rng.rand(p, 2) * 8 + 2
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    objectness = jnp.asarray(rng.rand(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 2)
    gt_oh = jnp.zeros(classes).at[jnp.asarray([0, 2])].set(1.0)
    cpgs = jnp.asarray(rng.rand(classes, imhw, imhw), jnp.float32)
    seg_feats = jnp.asarray(rng.rand(fhw, fhw, ch), jnp.float32)
    image = jnp.asarray(rng.rand(imhw, imhw, 3) * 255, jnp.float32)
    return pooled, boxes, objectness, valid, gt_oh, cpgs, seg_feats, image


@pytest.mark.parametrize("constraint", [False, True])
def test_wsjds_head_train_and_grad(constraint):
    rng = np.random.RandomState(0)
    (pooled, boxes, objectness, valid, gt_oh, cpgs, seg_feats,
     image) = _wsjds_inputs(rng)
    head = WSJDSROIHead(num_classes=3, dan_dims=(32, 32), aspp_dims=(8, 8),
                        constraint=constraint)
    use_csc = jnp.asarray(True)
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cpgs, seg_feats, image, use_csc,
                       method=head.losses)

    def loss_fn(prm):
        losses = head.apply(prm, pooled, boxes, objectness, valid, gt_oh,
                            cpgs, seg_feats, image, use_csc,
                            method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    expected = {"loss_cls_pos", "loss_cls_neg", "loss_sem_seg",
                "mask_loss_cls_pos", "mask_loss_cls_neg"}
    if constraint:
        expected.add("loss_constraint")
    assert set(losses) == expected
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # both the detection AND segmentation branches receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    seg_grads = [np.abs(g).max() for path, g in flat
                 if any("sem_seg_head" in str(k) for k in path)]
    det_grads = [np.abs(g).max() for path, g in flat
                 if any("wsddn" in str(k) for k in path)]
    assert max(seg_grads) > 0 and max(det_grads) > 0


def test_wsjds_predict_and_crop():
    rng = np.random.RandomState(1)
    (pooled, boxes, objectness, valid, gt_oh, cpgs, seg_feats,
     image) = _wsjds_inputs(rng)
    head = WSJDSROIHead(num_classes=3, dan_dims=(32, 32), aspp_dims=(8, 8))
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cpgs, seg_feats, image,
                       jnp.asarray(True), method=head.losses)
    scores, out_boxes, masks = head.apply(
        params, pooled, boxes, objectness, valid, seg_feats, (24, 24),
        method=head.predict)
    assert scores.shape == (12, 4)
    assert masks.shape == (3, 24, 24)
    assert np.all((np.asarray(masks) >= 0) & (np.asarray(masks) <= 1))

    det_boxes = jnp.asarray([[2, 2, 10, 10], [0, 0, 24, 24]], jnp.float32)
    det_classes = jnp.asarray([0, 2], jnp.int32)
    inst = crop_instance_masks(masks, det_boxes, det_classes)
    assert inst.shape == (2, 24, 24)
    inst = np.asarray(inst)
    assert np.all(inst[0][:, 10:] == 0.0) and np.all(inst[0][10:, :] == 0.0)
    np.testing.assert_allclose(inst[1], np.asarray(masks)[2])
