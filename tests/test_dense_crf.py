"""Tests for the native dense CRF (bilateral-grid filtering + mean-field)."""
import numpy as np
import pytest

from sos_wsod_tpu.ops.dense_crf import dense_crf, grid_filter


def _brute_gaussian(features, values):
    """O(n^2) reference: gaussian weights exp(-|f_i - f_j|^2 / 2)."""
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    w = np.exp(-0.5 * d2)
    return w @ values


def test_grid_filter_matches_brute_force():
    """The grid approximation should be close to true gaussian filtering
    (same shape, high correlation) on a small random cloud."""
    rng = np.random.RandomState(0)
    n = 200
    feats = rng.rand(n, 2).astype(np.float32) * 6
    vals = rng.rand(n, 3).astype(np.float32)
    got = grid_filter(feats, vals)
    want = _brute_gaussian(feats, vals)
    # normalise both (the grid blur kernel's mass differs from exp(-d^2/2))
    gotn = got / grid_filter(feats, np.ones((n, 1), np.float32))
    wantn = want / (_brute_gaussian(feats, np.ones((n, 1), np.float32)))
    corr = np.corrcoef(gotn.ravel(), wantn.ravel())[0, 1]
    assert corr > 0.95
    np.testing.assert_allclose(gotn.mean(), wantn.mean(), rtol=0.05)


def test_grid_filter_constant_preserved():
    rng = np.random.RandomState(1)
    feats = rng.rand(100, 5).astype(np.float32) * 4
    vals = np.full((100, 2), 7.0, np.float32)
    got = grid_filter(feats, vals)
    norm = grid_filter(feats, np.ones((100, 1), np.float32))
    np.testing.assert_allclose(got / norm, 7.0, rtol=1e-4)


def _two_region_image(h=40, w=40):
    img = np.zeros((3, h, w), np.uint8)
    img[:, :, : w // 2] = 40
    img[:, :, w // 2:] = 200
    return img


def test_dense_crf_follows_image_edges():
    """A noisy unary whose true segmentation follows the image's color edge
    should be cleaned up along that edge."""
    h = w = 40
    img = _two_region_image(h, w)
    rng = np.random.RandomState(0)
    # true label: 0 on the left, 1 on the right; unary 65% correct
    probs = np.empty((2, h, w), np.float32)
    correct = rng.rand(h, w) < 0.65
    left = np.arange(w)[None, :] < w // 2
    label = np.where(left, 0, 1)
    noisy = np.where(correct, label, 1 - label)
    probs[0] = np.where(noisy == 0, 0.9, 0.1)
    probs[1] = 1 - probs[0]
    # size_std = max(h, w) pins the internal scale factor to 1 so the stds
    # below are used as-is (production semantics: -log(p) unaries)
    out = dense_crf(probs, img, max_iter=10, size_std=float(max(h, w)),
                    pos_w=1.0, pos_x_std=3.0, pos_y_std=3.0,
                    bi_w=4.0, bi_x_std=20.0, bi_y_std=20.0,
                    bi_r_std=30.0, bi_g_std=30.0, bi_b_std=30.0)
    assert out.shape == (2, h, w)
    np.testing.assert_allclose(out.sum(0), 1.0, rtol=1e-4)
    pred = out.argmax(0)
    acc = (pred == label).mean()
    noisy_acc = (noisy == label).mean()
    assert acc > 0.95 and acc > noisy_acc + 0.2


def test_dense_crf_image_resize_and_float_input():
    probs = np.full((2, 16, 16), 0.5, np.float32)
    image = np.random.RandomState(0).randn(3, 32, 32).astype(np.float32) * 10
    out = dense_crf(probs, image, max_iter=2)
    assert out.shape == (2, 16, 16)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out.sum(0), 1.0, rtol=1e-4)
