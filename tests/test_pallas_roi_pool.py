"""Parity tests for the fused Pallas ROIPool (interpret mode on CPU).

Oracle: the argmax-key doubling-table path (ops/roi_pool.py), itself parity-
tested against the numpy torchvision oracle in tests/test_ops.py — both
implement torchvision roi_pool semantics including first-scan-hit argmax
(reference consumer: uwsod/projects/WSL/wsl/modeling/poolers.py:183-185).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_wsod_tpu.ops.roi_pool import _roi_pool_argmax_fwd_impl
from sos_wsod_tpu.ops.pallas.roi_pool_fused import (
    _roi_pool_fused_fwd_impl,
    roi_pool_fused,
    roi_pool_fused_supported,
)


def _mixed_boxes(rng, p, img_h, img_w):
    x1 = rng.uniform(0, img_w - 10, p)
    y1 = rng.uniform(0, img_h - 10, p)
    x2 = np.minimum(x1 + rng.uniform(2, img_w / 2, p), img_w)
    y2 = np.minimum(y1 + rng.uniform(2, img_h / 2, p), img_h)
    boxes = np.stack([x1, y1, x2, y2], 1)
    boxes[0] = [0, 0, img_w, img_h]                      # whole image (wide)
    boxes[1] = [5, 5, 6, 6]                              # sub-cell tiny
    boxes[2] = [img_w - 4, img_h - 4, img_w, img_h]      # bottom-right corner
    boxes[3] = [0, 0, 3, img_h]                          # tall sliver
    return jnp.asarray(boxes, jnp.float32)


@pytest.mark.parametrize("hw", [(40, 64), (35, 44)])   # aligned + ragged W
def test_fused_matches_argmax_table(hw):
    h, w = hw
    c, p = 128, 24
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(h, w, c), jnp.bfloat16)
    boxes = _mixed_boxes(rng, p, h * 8, w * 8)
    valid = jnp.asarray(rng.rand(p) > 0.2)
    rs = jnp.asarray(rng.uniform(1, 2, p), jnp.float32)

    out, pos = _roi_pool_fused_fwd_impl(
        feat, boxes, valid, rs, spatial_scale=0.125, output_size=(7, 7),
        interpret=True)

    ref_out, ref_pos = _roi_pool_argmax_fwd_impl(
        feat, boxes, valid, 0.125, (7, 7))
    ref = jnp.transpose(ref_out, (0, 2, 3, 1))
    ref = ref * rs[:, None, None, None].astype(jnp.bfloat16)
    ref = jnp.where(ref_pos >= 0, ref, 0)

    np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref_pos))
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32))


def test_fused_backward_first_hit_scatter():
    h, w, c, p = 24, 40, 64, 12
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(h, w, c), jnp.bfloat16)
    boxes = _mixed_boxes(rng, p, h * 8, w * 8)
    valid = jnp.asarray(rng.rand(p) > 0.2)
    rs = jnp.asarray(rng.uniform(1, 2, p), jnp.float32)
    g = jnp.asarray(rng.randn(p, 7, 7, c), jnp.bfloat16)

    def loss(f):
        out = roi_pool_fused(f, boxes, valid, rs, 0.125, (7, 7), True)
        return jnp.vdot(out.astype(jnp.float32), g.astype(jnp.float32))

    grad = jax.grad(loss)(feat)

    _, pos = _roi_pool_argmax_fwd_impl(feat, boxes, valid, 0.125, (7, 7))
    pos_np = np.asarray(pos).reshape(-1, c)
    g_np = (np.asarray(g, np.float64)
            * np.asarray(rs)[:, None, None, None]).reshape(-1, c)
    acc = np.zeros((h * w, c))
    for i in range(pos_np.shape[0]):
        m = pos_np[i] >= 0
        np.add.at(acc, (pos_np[i][m], np.arange(c)[m]), g_np[i][m])
    np.testing.assert_allclose(
        np.asarray(grad, np.float32).reshape(h * w, c),
        acc.astype(np.float32), rtol=2e-2, atol=1e-2)


def test_fused_ties_route_to_first_scan_hit():
    # constant plateau: every window cell ties; gradient must land on the
    # window's smallest flat y*W+x (torchvision first-hit), not be split
    h, w, c, p = 16, 32, 8, 2
    feat = jnp.ones((h, w, c), jnp.bfloat16)
    boxes = jnp.asarray([[16.0, 16.0, 112.0, 96.0],
                         [0.0, 0.0, 255.0, 127.0]], jnp.float32)
    valid = jnp.ones((p,), bool)

    def loss(f):
        out = roi_pool_fused(f, boxes, valid, None, 0.125, (7, 7), True)
        return out.astype(jnp.float32).sum()

    grad = np.asarray(jax.grad(loss)(feat), np.float32)
    _, pos = _roi_pool_fused_fwd_impl(
        feat, boxes, valid, None, spatial_scale=0.125, output_size=(7, 7),
        interpret=True)
    pos = np.asarray(pos)
    # each bin contributes exactly 1 unit at its first-hit cell
    exp = np.zeros((h * w, c))
    np.add.at(exp, (pos.reshape(-1, c)[:, 0], 0), 1.0)
    for ch in range(1, c):
        exp[:, ch] = exp[:, 0]
    np.testing.assert_array_equal(grad.reshape(h * w, c), exp)
    # spot-check: first bin of roi 0 covers rows>=2, cols>=2 -> pos 2*32+2
    assert pos[0, 0, 0, 0] == 2 * 32 + 2


def test_supported_predicate():
    assert roi_pool_fused_supported(86, 128, 512, jnp.bfloat16)
    assert roi_pool_fused_supported(40, 64, 100, jnp.bfloat16)        # 1 chunk
    assert not roi_pool_fused_supported(86, 128, 512, jnp.float32)
    assert not roi_pool_fused_supported(200, 256, 512, jnp.bfloat16)  # >2^15
    assert not roi_pool_fused_supported(40, 24, 512, jnp.bfloat16)    # W<32
    assert not roi_pool_fused_supported(40, 64, 200, jnp.bfloat16)    # C%128
