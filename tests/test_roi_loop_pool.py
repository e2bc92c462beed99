"""ROILoopPool parity vs a direct numpy transliteration of the reference CUDA
kernel (ROILoopPool_cuda.cu:10-203, context_ratio 1.8)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.ops.roi_loop_pool import roi_loop_pool


def oracle(feat_hwc, rois, spatial_scale, pooled, ratio=1.8):
    """numpy port of the CUDA kernel (non-negative-input assumption: max
    initialized at 0)."""
    h, w, c = feat_hwc.shape
    p = rois.shape[0]
    out = np.zeros((3 * p, c, pooled, pooled), np.float32)

    def bin_bounds(ph, pw, rs_h, rs_w, roi_h, roi_w):
        bh = roi_h / pooled
        bw = roi_w / pooled
        hs = int(np.floor(ph * bh)) + rs_h
        he = int(np.ceil((ph + 1) * bh)) + rs_h
        ws = int(np.floor(pw * bw)) + rs_w
        we = int(np.ceil((pw + 1) * bw)) + rs_w
        return max(min(hs, h), 0), max(min(he, h), 0), max(min(ws, w), 0), max(min(we, w), 0)

    for n in range(p):
        x1, y1, x2, y2 = rois[n]
        rw, rh = x2 - x1, y2 - y1
        in_rw, in_rh = (rw - rw / ratio) / 2, (rh - rh / ratio) / 2
        out_rw, out_rh = (rw * ratio - rw) / 2, (rh * ratio - rh) / 2
        mx, my = w / spatial_scale, h / spatial_scale
        x1i, y1i = np.clip(x1 + in_rw, 0, mx), np.clip(y1 + in_rh, 0, my)
        x2i, y2i = np.clip(x2 - in_rw, 0, mx), np.clip(y2 - in_rh, 0, my)
        x1o, y1o = np.clip(x1 - out_rw, 0, mx), np.clip(y1 - out_rh, 0, my)
        x2o, y2o = np.clip(x2 + out_rw, 0, mx), np.clip(y2 + out_rh, 0, my)

        def snap(v):
            return int(np.floor(v * spatial_scale + 0.5))

        # block 0 + 1 windows from the original box
        rs_w, rs_h, re_w, re_h = snap(x1), snap(y1), snap(x2), snap(y2)
        roi_w = max(re_w - rs_w + 1, 1)
        roi_h = max(re_h - rs_h + 1, 1)
        ih1, iw1, ih2, iw2 = snap(y1i), snap(x1i), snap(y2i), snap(x2i)
        for ph in range(pooled):
            for pw in range(pooled):
                hs, he, ws, we = bin_bounds(ph, pw, rs_h, rs_w, roi_h, roi_w)
                for ci in range(c):
                    mval, fval = 0.0, 0.0
                    for hh in range(hs, he):
                        for ww in range(ws, we):
                            v = feat_hwc[hh, ww, ci]
                            mval = max(mval, v)
                            inside = (ih1 < hh < ih2) and (iw1 < ww < iw2)
                            if not inside:
                                fval = max(fval, v)
                    out[n, ci, ph, pw] = mval
                    out[p + n, ci, ph, pw] = fval
        # block 2 windows from the outer box, excluding the original box interior
        rs_w, rs_h, re_w, re_h = snap(x1o), snap(y1o), snap(x2o), snap(y2o)
        roi_w = max(re_w - rs_w + 1, 1)
        roi_h = max(re_h - rs_h + 1, 1)
        bh1, bw1, bh2, bw2 = snap(y1), snap(x1), snap(y2), snap(x2)
        for ph in range(pooled):
            for pw in range(pooled):
                hs, he, ws, we = bin_bounds(ph, pw, rs_h, rs_w, roi_h, roi_w)
                for ci in range(c):
                    mval = 0.0
                    for hh in range(hs, he):
                        for ww in range(ws, we):
                            inside = (bh1 < hh < bh2) and (bw1 < ww < bw2)
                            if inside:
                                continue
                            mval = max(mval, feat_hwc[hh, ww, ci])
                    out[2 * p + n, ci, ph, pw] = mval
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_roi_loop_pool_parity(seed):
    rng = np.random.RandomState(seed)
    h, w, c, p = 24, 32, 3, 6
    feat = rng.uniform(0, 1, (h, w, c)).astype(np.float32)  # non-negative like VGG relu
    scale = 0.25
    # boxes in image coords (image = 4x feature size)
    x1 = rng.uniform(0, w / scale * 0.6, p)
    y1 = rng.uniform(0, h / scale * 0.6, p)
    x2 = x1 + rng.uniform(8, w / scale * 0.4 - 1, p)
    y2 = y1 + rng.uniform(8, h / scale * 0.4 - 1, p)
    rois = np.stack([x1, y1, x2, y2], 1).astype(np.float32)

    got = np.asarray(
        roi_loop_pool(
            jnp.asarray(feat), jnp.asarray(rois), jnp.ones(p, bool),
            spatial_scale=scale, output_size=(7, 7),
        )
    )
    exp = oracle(feat, rois, scale, 7)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_roi_loop_pool_invalid_rows_zero():
    rng = np.random.RandomState(2)
    feat = rng.uniform(0, 1, (16, 16, 2)).astype(np.float32)
    rois = np.array([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 8.0, 8.0]], np.float32)
    valid = np.array([True, False])
    out = np.asarray(
        roi_loop_pool(jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(valid),
                      spatial_scale=0.25, output_size=(3, 3))
    )
    assert out.shape == (6, 2, 3, 3)
    assert np.abs(out[1]).max() == 0 and np.abs(out[3]).max() == 0 and np.abs(out[5]).max() == 0
    assert np.abs(out[0]).max() > 0
