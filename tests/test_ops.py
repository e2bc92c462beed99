import numpy as np
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.core import boxes as box_ops
from sos_wsod_tpu.core.matcher import Matcher
from sos_wsod_tpu.ops.nms import batched_nms_mask, keep_top_k, nms_mask
from sos_wsod_tpu.ops.roi_align import roi_align
from sos_wsod_tpu.ops.roi_pool import roi_pool

from oracles import matcher_np, nms_np, roi_align_np, roi_pool_np


def _rand_boxes(rng, n, h, w):
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    x2 = np.minimum(x1 + rng.uniform(1, w / 2, n), w)
    y2 = np.minimum(y1 + rng.uniform(1, h / 2, n), h)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


# ----------------------------------------------------------------- boxes
def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    b1 = _rand_boxes(rng, 13, 100, 150)
    b2 = _rand_boxes(rng, 17, 100, 150)
    got = np.asarray(box_ops.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    expect = np.where(inter > 0, inter / (a1[:, None] + a2[None] - inter), 0.0)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_box_delta_roundtrip():
    rng = np.random.RandomState(1)
    src = _rand_boxes(rng, 50, 200, 300)
    tgt = _rand_boxes(rng, 50, 200, 300)
    deltas = box_ops.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = box_ops.apply_deltas(deltas, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


def test_apply_deltas_scale_clamp():
    src = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.asarray([[0.0, 0.0, 1000.0, 1000.0]])
    out = np.asarray(box_ops.apply_deltas(deltas, src))
    assert np.isfinite(out).all()
    assert (out[0, 2] - out[0, 0]) <= 10 * 1000.0 / 16 + 1


def test_unique_boxes_keep_mask():
    b = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [1, 1, 5, 5], [0, 0, 10, 10.4]], np.float32)
    keep = box_ops.unique_boxes_keep_mask(b)
    # duplicate of row0 dropped; 10.4 rounds to 10 -> also a duplicate of row 0
    assert keep.tolist() == [True, False, True, False]


# ----------------------------------------------------------------- matcher
@pytest.mark.parametrize("n_gt", [0, 1, 5])
def test_matcher_parity(n_gt):
    rng = np.random.RandomState(2)
    n_pred, cap = 64, 8
    quality = rng.uniform(0, 1, (cap, n_pred)).astype(np.float32)
    gt_valid = np.zeros(cap, bool)
    gt_valid[:n_gt] = True
    m = Matcher([0.5, 0.6], [0, -1, 1])
    got_idx, got_lab = m(jnp.asarray(quality), jnp.asarray(gt_valid))
    exp_idx, exp_lab = matcher_np(quality[:n_gt], [0.5, 0.6], [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(got_lab), exp_lab)
    if n_gt > 0:  # indices only meaningful when a gt exists
        np.testing.assert_array_equal(np.asarray(got_idx), exp_idx)


def test_matcher_low_quality():
    # one gt overlapping nothing above threshold: best pred gets promoted
    quality = np.array([[0.2, 0.1, 0.05]], np.float32)
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    _, lab = m(jnp.asarray(quality), jnp.asarray([True]))
    assert np.asarray(lab).tolist() == [1, 0, 0]


# ----------------------------------------------------------------- nms
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.01, 0.3, 0.5, 0.9])
def test_nms_parity(seed, thresh):
    rng = np.random.RandomState(seed)
    n = 100
    b = _rand_boxes(rng, n, 80, 120)
    s = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    got = np.asarray(nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.asarray(valid), thresh))
    exp = nms_np(b, s, thresh)
    np.testing.assert_array_equal(got, exp)


def test_nms_with_padding():
    rng = np.random.RandomState(7)
    b = _rand_boxes(rng, 32, 80, 120)
    s = rng.uniform(0, 1, 32).astype(np.float32)
    valid = np.zeros(32, bool)
    valid[:20] = True
    got = np.asarray(nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.asarray(valid), 0.5))
    exp = nms_np(b[:20], s[:20], 0.5)
    np.testing.assert_array_equal(got[:20], exp)
    assert not got[20:].any()


def test_batched_nms_classes_dont_suppress():
    b = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    s = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    keep = np.asarray(
        batched_nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.asarray(idxs), jnp.ones(2, bool), 0.5)
    )
    assert keep.tolist() == [True, True]


def test_keep_top_k():
    s = jnp.asarray([0.9, 0.1, 0.8, 0.7, 0.5])
    keep = jnp.asarray([True, True, False, True, True])
    out = np.asarray(keep_top_k(s, keep, 2))
    assert out.tolist() == [True, False, False, True, False]


# ----------------------------------------------------------------- roi pool
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("hw", [(20, 28), (37, 53)])
def test_roi_pool_parity(seed, hw):
    rng = np.random.RandomState(seed)
    h, w, c = hw[0], hw[1], 6
    feat = rng.randn(h, w, c).astype(np.float32)
    n = 40
    scale = 0.125
    boxes = _rand_boxes(rng, n, h / scale, w / scale)
    got = np.asarray(
        roi_pool(
            jnp.asarray(feat), jnp.asarray(boxes), jnp.ones(n, bool),
            spatial_scale=scale, output_size=(7, 7), chunk=16,
        )
    )
    exp = roi_pool_np(feat.transpose(2, 0, 1), boxes, scale, 7, 7)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_roi_pool_whole_image_box():
    rng = np.random.RandomState(3)
    h, w, c = 32, 48, 4
    feat = rng.randn(h, w, c).astype(np.float32)
    boxes = np.array([[0, 0, w * 8 - 1, h * 8 - 1]], np.float32)
    got = np.asarray(
        roi_pool(jnp.asarray(feat), jnp.asarray(boxes), jnp.ones(1, bool),
                 spatial_scale=0.125, output_size=(7, 7))
    )
    exp = roi_pool_np(feat.transpose(2, 0, 1), boxes, 0.125, 7, 7)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_roi_pool_invalid_rows_zero():
    rng = np.random.RandomState(4)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    boxes = np.array([[0, 0, 64, 64], [0, 0, 64, 64]], np.float32)
    valid = np.array([True, False])
    got = np.asarray(
        roi_pool(jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray(valid),
                 spatial_scale=0.25, output_size=(7, 7))
    )
    assert np.abs(got[1]).max() == 0
    assert np.abs(got[0]).max() > 0


def test_roi_pool_gradient_flows():
    import jax

    rng = np.random.RandomState(5)
    feat = rng.randn(16, 20, 4).astype(np.float32)
    boxes = jnp.asarray(_rand_boxes(rng, 8, 16 / 0.25, 20 / 0.25))

    def loss(f):
        out = roi_pool(f, boxes, jnp.ones(8, bool), spatial_scale=0.25, output_size=(7, 7))
        return jnp.sum(out)

    g = jax.grad(loss)(jnp.asarray(feat))
    assert np.isfinite(np.asarray(g)).all()
    # total grad mass equals number of (non-empty-window) pooled cells
    assert np.asarray(g).sum() > 0


@pytest.mark.parametrize("num_corners", [2, 4])
def test_roi_pool_multi_matches_per_view(num_corners):
    """roi_pool_multi (fused 4-view gather) == per-view roi_pool, fwd + grad,
    under both table families (exact-H nc=2 and doubling-H nc=4)."""
    import jax
    from sos_wsod_tpu.ops.roi_pool import roi_pool_multi

    rng = np.random.RandomState(7)
    scale = 0.125
    shapes = [(22, 32), (22, 32), (18, 26), (18, 26)]  # 2 scales x id/flip
    c, p = 6, 24
    feats = [jnp.asarray(rng.randn(h, w, c), jnp.float32) for h, w in shapes]
    boxes = np.stack([_rand_boxes(rng, p, h / scale, w / scale)
                      for h, w in shapes])
    valid = np.ones(p, bool); valid[-3:] = False
    rs = rng.uniform(1.0, 2.0, p).astype(np.float32)

    def multi(fs):
        return roi_pool_multi(fs, jnp.asarray(boxes), jnp.asarray(valid),
                              jnp.asarray(rs), spatial_scale=scale,
                              output_size=(7, 7), num_corners=num_corners)

    def per_view(fs):
        return jnp.stack([
            roi_pool(fs[i], jnp.asarray(boxes[i]), jnp.asarray(valid),
                     jnp.asarray(rs), spatial_scale=scale, output_size=(7, 7),
                     channels_last=True)
            for i in range(4)
        ])

    out_m = multi(tuple(feats))
    out_s = per_view(tuple(feats))
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)

    ct = jnp.asarray(rng.randn(*out_m.shape), jnp.float32)
    gm = jax.grad(lambda fs: jnp.vdot(multi(fs), ct))(tuple(feats))
    gs = jax.grad(lambda fs: jnp.vdot(per_view(fs), ct))(tuple(feats))
    for a, b in zip(gm, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # row-chunked variant (SOS_POOL_ROW_CHUNKS / TPU.POOL_ROW_CHUNKS): fwd is
    # bit-identical (chunking only slices the gather); grads match to ULP
    # (chunked scatter-adds accumulate duplicate table rows in a different
    # order). 3 does not divide P*49, exercising remainder-absorbing slicing.
    for chunks in (3, 8):
        def multi_c(fs, n=chunks):
            return roi_pool_multi(fs, jnp.asarray(boxes), jnp.asarray(valid),
                                  jnp.asarray(rs), spatial_scale=scale,
                                  output_size=(7, 7),
                                  num_corners=num_corners, row_chunks=n)

        np.testing.assert_array_equal(np.asarray(multi_c(tuple(feats))),
                                      np.asarray(out_m))
        gc = jax.grad(lambda fs: jnp.vdot(multi_c(fs), ct))(tuple(feats))
        for a, b in zip(gc, gm):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------- roi align
@pytest.mark.parametrize("sampling_ratio", [2, 0])
@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_parity(sampling_ratio, aligned):
    rng = np.random.RandomState(11)
    h, w, c = 24, 30, 5
    feat = rng.randn(h, w, c).astype(np.float32)
    n = 24
    scale = 0.25
    boxes = _rand_boxes(rng, n, h / scale, w / scale)
    # keep adaptive grids within the static cap for exactness
    if sampling_ratio == 0:
        wh = boxes[:, 2:] - boxes[:, :2]
        boxes[:, 2:] = boxes[:, :2] + np.minimum(wh, 7 * 8 / scale * 0.9)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), jnp.ones(n, bool),
                  spatial_scale=scale, output_size=(7, 7),
                  sampling_ratio=sampling_ratio, aligned=aligned, sample_cap=8)
    )
    exp = roi_align_np(feat.transpose(2, 0, 1), boxes, scale, 7, 7, sampling_ratio, aligned)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_roi_pool_bf16_argmax_path_parity():
    """The bf16 argmax-key fast path must match the f32 table path (values
    computed in bf16) and the numpy oracle."""
    import jax

    rng = np.random.RandomState(11)
    h, w, c, p = 24, 32, 8, 16
    feat = (rng.randn(h, w, c) * 2).astype(np.float32)
    feat_bf = jnp.asarray(feat, jnp.bfloat16)
    pts = rng.rand(p, 2) * np.array([200, 150])
    wh = rng.rand(p, 2) * 100 + 8
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 2)

    got = roi_pool(feat_bf, boxes, valid, spatial_scale=0.125,
                   output_size=(7, 7), exact_argmax_grad=True)
    assert got.dtype == jnp.bfloat16
    want = roi_pool(jnp.asarray(np.asarray(feat_bf, np.float32)), boxes,
                    valid, spatial_scale=0.125, output_size=(7, 7))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0, atol=0)


def test_roi_pool_bf16_grad_routes_to_argmax():
    """Gradient lands on exactly the max cell (first scan position on ties)."""
    import jax

    h, w, c = 8, 8, 2
    feat = np.zeros((h, w, c), np.float32)
    feat[2, 3, 0] = 5.0      # unique max for channel 0
    feat[1, 1, 1] = 7.0
    feat[4, 4, 1] = 7.0      # tie: first scan position is (1,1)
    feat_bf = jnp.asarray(feat, jnp.bfloat16)
    boxes = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])  # whole map at scale 1/8
    valid = jnp.asarray([True])

    def f(x):
        out = roi_pool(x, boxes, valid, spatial_scale=0.125,
                       output_size=(1, 1), exact_argmax_grad=True)
        return jnp.sum(jnp.asarray(out, jnp.float32))

    g = np.asarray(jax.grad(f)(feat_bf), np.float32)
    assert g[2, 3, 0] == 1.0 and g.sum() == 2.0
    assert g[1, 1, 1] == 1.0 and g[4, 4, 1] == 0.0
