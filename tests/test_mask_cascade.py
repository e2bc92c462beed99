"""Tests for the mask branch and cascade ROI heads."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.roi_heads.mask_cascade import (
    CascadeROIHeads, MaskRCNNConvUpsampleHead, MaskROIHeads, crop_gt_masks,
    mask_rcnn_loss)


def _fpn_features(rng, hw=32, c=16):
    feats = {}
    for name, s in zip(("p2", "p3", "p4", "p5"), (4, 8, 16, 32)):
        feats[name] = jnp.asarray(rng.rand(hw * 4 // s, hw * 4 // s, c),
                                  jnp.float32)
    return feats


def test_mask_head_shapes():
    head = MaskRCNNConvUpsampleHead(num_classes=5, num_conv=2, conv_dim=8)
    x = jnp.zeros((6, 14, 14, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (6, 28, 28, 5)


def test_crop_gt_masks():
    masks = np.zeros((2, 64, 64), np.float32)
    masks[0, 8:24, 8:24] = 1.0      # gt 0: square
    masks[1, :, :] = 1.0            # gt 1: full image
    boxes = jnp.asarray([[8, 8, 24, 24], [0, 0, 64, 64], [40, 40, 60, 60]],
                        jnp.float32)
    matched = jnp.asarray([0, 1, 0], jnp.int32)
    crops = np.asarray(crop_gt_masks(jnp.asarray(masks), boxes, matched, 28))
    assert crops.shape == (3, 28, 28)
    assert crops[0].mean() > 0.9    # box aligned with the square -> all fg
    np.testing.assert_allclose(crops[1], 1.0)
    np.testing.assert_allclose(crops[2], 0.0)  # box outside gt-0's square


def test_mask_rcnn_loss_perfect_prediction():
    s, r, k = 4, 8, 3
    targets = (np.random.RandomState(0).rand(s, r, r) > 0.5).astype(np.float32)
    logits = np.zeros((s, r, r, k), np.float32)
    gt_cls = np.array([0, 1, 2, 0])
    for i in range(s):
        logits[i, :, :, gt_cls[i]] = np.where(targets[i] > 0.5, 20.0, -20.0)
    fg = jnp.asarray([True, True, True, False])
    loss = mask_rcnn_loss(jnp.asarray(logits), jnp.asarray(gt_cls), fg,
                          jnp.asarray(targets))
    assert float(loss) < 1e-6
    # wrong prediction -> large loss
    loss_bad = mask_rcnn_loss(-jnp.asarray(logits), jnp.asarray(gt_cls), fg,
                              jnp.asarray(targets))
    assert float(loss_bad) > 1.0


def test_mask_roi_heads_train_and_predict():
    rng = np.random.RandomState(0)
    feats = _fpn_features(rng)
    head = MaskROIHeads(num_classes=3, num_conv=2, conv_dim=8,
                        pooler_resolution=14)
    s = 8
    pts = rng.rand(s, 2) * 80
    wh = rng.rand(s, 2) * 30 + 8
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    valid = jnp.asarray(np.arange(s) < 6)
    gt_classes = jnp.asarray(rng.randint(0, 3, s), jnp.int32)
    fg = jnp.asarray(np.arange(s) < 4)
    gt_masks = jnp.asarray((rng.rand(2, 128, 128) > 0.5), jnp.float32)
    matched = jnp.asarray(rng.randint(0, 2, s), jnp.int32)

    params = head.init(jax.random.PRNGKey(0), feats, boxes, valid,
                       gt_classes, fg, gt_masks, matched, method=head.losses)

    def loss_fn(p):
        return head.apply(p, feats, boxes, valid, gt_classes, fg, gt_masks,
                          matched, method=head.losses)["loss_mask"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert any(np.abs(g).max() > 0 for g in jax.tree_util.tree_leaves(grads))

    pred = head.apply(params, feats, boxes, valid, gt_classes,
                      method=head.predict)
    assert pred.shape == (s, 28, 28)
    assert np.all((np.asarray(pred) >= 0) & (np.asarray(pred) <= 1))


@pytest.mark.slow
def test_cascade_roi_heads():
    rng = np.random.RandomState(1)
    feats = _fpn_features(rng)
    head = CascadeROIHeads(num_classes=3, batch_size_per_image=16,
                           fc_dim=32)
    p, g = 24, 3
    pts = rng.rand(p, 2) * 80
    wh = rng.rand(p, 2) * 30 + 8
    prop_boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    prop_logits = jnp.asarray(rng.rand(p), jnp.float32)
    prop_valid = jnp.asarray(np.arange(p) < p - 4)
    gpts = rng.rand(g, 2) * 70
    gwh = rng.rand(g, 2) * 40 + 10
    gt_boxes = jnp.asarray(np.concatenate([gpts, gpts + gwh], 1), jnp.float32)
    gt_classes = jnp.asarray([0, 2, 1], jnp.int32)
    gt_valid = jnp.asarray([True, True, False])
    image_hw = jnp.asarray([128, 128], jnp.int32)
    rng_key = jax.random.PRNGKey(0)

    params = head.init(jax.random.PRNGKey(1), feats, prop_boxes, prop_logits,
                       prop_valid, gt_boxes, gt_classes, gt_valid, rng_key,
                       image_hw, method=head.losses)

    def loss_fn(prm):
        losses = head.apply(prm, feats, prop_boxes, prop_logits, prop_valid,
                            gt_boxes, gt_classes, gt_valid, rng_key, image_hw,
                            method=head.losses)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"loss_cls_stage0", "loss_cls_stage1", "loss_cls_stage2",
            "loss_box_reg_stage0"} <= set(losses)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(grads))
    # every stage's predictor received gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for k in range(3):
        gk = [np.abs(v).max() for path, v in flat
              if any(f"box_predictor_{k}" in str(kk) for kk in path)]
        assert max(gk) > 0

    scores, out_boxes = head.apply(params, feats, prop_boxes, prop_valid,
                                   image_hw, method=head.predict_scores_boxes)
    assert scores.shape == (p + g, 4) or scores.shape[1] == 4
    assert np.all(np.isfinite(np.asarray(scores)))
