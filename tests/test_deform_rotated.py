"""Tests for deformable conv and rotated-box ops."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.ops.deform_conv import deform_conv2d
from sos_wsod_tpu.ops.rotated import (batched_nms_rotated, box_to_corners,
                                      nms_rotated_mask, pairwise_iou_rotated)


# ------------------------------------------------------------- deform conv
def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets (and no modulation) deform_conv == plain conv."""
    rng = np.random.RandomState(0)
    h, w, ci, co = 10, 12, 4, 6
    x = jnp.asarray(rng.randn(h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    off = jnp.zeros((h, w, 18), jnp.float32)
    got = deform_conv2d(x, off, wgt, stride=1, padding=1)
    want = jax.lax.conv_general_dilated(
        x[None], wgt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_deform_conv_integer_shift():
    """An integer offset of (0, 1) on every tap equals conv on x shifted
    left by one pixel."""
    rng = np.random.RandomState(1)
    h, w, ci, co = 8, 8, 3, 5
    x = np.zeros((h, w + 1, ci), np.float32)
    x[:, :, :] = rng.randn(h, w + 1, ci)
    wgt = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    off = np.zeros((h, w, 18), np.float32)
    off[:, :, 1::2] = 1.0  # dx = +1
    got = deform_conv2d(jnp.asarray(x[:, :w]), jnp.asarray(off), wgt,
                        stride=1, padding=1)
    # interior must match plain conv on the shifted input
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x[:, 1:w + 1])[None], wgt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got)[1:-1, 1:-2],
                               np.asarray(want)[1:-1, 1:-2],
                               rtol=2e-4, atol=2e-4)


def test_deform_conv_modulated_and_grad():
    rng = np.random.RandomState(2)
    h, w, ci, co = 6, 6, 3, 4
    x = jnp.asarray(rng.randn(h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
    off = jnp.asarray(rng.randn(h, w, 18) * 0.5, jnp.float32)
    mask = jnp.asarray(rng.rand(h, w, 9), jnp.float32)
    bias = jnp.asarray(rng.randn(co), jnp.float32)

    def f(x_, off_, w_):
        return jnp.sum(deform_conv2d(x_, off_, w_, mask, bias,
                                     stride=1, padding=1) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(x, off, wgt)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in g)
    assert all(float(jnp.max(jnp.abs(t))) > 0 for t in g)
    # zero modulation kills the output (minus bias)
    out0 = deform_conv2d(x, off, wgt, jnp.zeros((h, w, 9)), bias,
                         stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out0),
                               np.broadcast_to(np.asarray(bias), (h, w, co)),
                               rtol=1e-5, atol=1e-6)


def test_deform_conv_stride2():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(9, 11, 2), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, 2, 4) * 0.1, jnp.float32)
    ho, wo = (9 + 2 - 3) // 2 + 1, (11 + 2 - 3) // 2 + 1
    off = jnp.zeros((ho, wo, 18))
    out = deform_conv2d(x, off, wgt, stride=2, padding=1)
    want = jax.lax.conv_general_dilated(
        x[None], wgt, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------- rotated IoU
def test_rotated_iou_axis_aligned_matches_regular():
    from sos_wsod_tpu.core.boxes import pairwise_iou

    rng = np.random.RandomState(0)
    n, m = 6, 5
    c1 = rng.rand(n, 2) * 80 + 20
    wh1 = rng.rand(n, 2) * 30 + 5
    c2 = rng.rand(m, 2) * 80 + 20
    wh2 = rng.rand(m, 2) * 30 + 5
    rb1 = jnp.asarray(np.concatenate([c1, wh1, np.zeros((n, 1))], 1), jnp.float32)
    rb2 = jnp.asarray(np.concatenate([c2, wh2, np.zeros((m, 1))], 1), jnp.float32)
    xy1 = jnp.asarray(np.concatenate([c1 - wh1 / 2, c1 + wh1 / 2], 1), jnp.float32)
    xy2 = jnp.asarray(np.concatenate([c2 - wh2 / 2, c2 + wh2 / 2], 1), jnp.float32)
    got = pairwise_iou_rotated(rb1, rb2)
    want = pairwise_iou(xy1, xy2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_rotated_iou_45_degrees():
    """Unit square vs itself rotated 45°: intersection is a regular octagon
    with area 2*(sqrt(2)-1), union 2 - that area."""
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 45.0]])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    got = float(pairwise_iou_rotated(a, b)[0, 0])
    assert got == pytest.approx(want, rel=1e-4)
    # symmetric + identical boxes
    assert float(pairwise_iou_rotated(b, a)[0, 0]) == pytest.approx(want, rel=1e-4)
    assert float(pairwise_iou_rotated(a, a)[0, 0]) == pytest.approx(1.0, rel=1e-5)


def test_rotated_iou_180_invariance():
    a = jnp.asarray([[10.0, 20.0, 8.0, 4.0, 30.0]])
    b = jnp.asarray([[10.0, 20.0, 8.0, 4.0, 210.0]])
    assert float(pairwise_iou_rotated(a, b)[0, 0]) == pytest.approx(1.0, rel=1e-5)


def test_rotated_iou_disjoint():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 15.0]])
    b = jnp.asarray([[100.0, 100.0, 2.0, 2.0, 60.0]])
    assert float(pairwise_iou_rotated(a, b)[0, 0]) == 0.0


def test_nms_rotated():
    boxes = jnp.asarray([
        [10, 10, 8, 4, 0],
        [10, 10, 8, 4, 5],     # near-duplicate of the first, lower score
        [40, 40, 8, 4, 90],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    keep = nms_rotated_mask(boxes, scores, valid, 0.5)
    assert np.asarray(keep).tolist() == [True, False, True]
    # different class ids -> no suppression
    keep2 = batched_nms_rotated(boxes, scores, jnp.asarray([0, 1, 0]),
                                valid, 0.5)
    assert np.asarray(keep2).tolist() == [True, True, True]


def test_box_to_corners_width_along_x():
    c = np.asarray(box_to_corners(jnp.asarray([[5.0, 7.0, 4.0, 2.0, 0.0]])))[0]
    assert c.min(0).tolist() == [3.0, 6.0]
    assert c.max(0).tolist() == [7.0, 8.0]
