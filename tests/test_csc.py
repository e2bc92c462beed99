"""Tests for the CSC op (kernel-parity oracle), CPG computation, the CSC
head, and the ContextLocNet head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.ops.csc import csc, csc_constraint
from sos_wsod_tpu.models.heads.csc import CSCROIHead, compute_cpg, csc_mil_loss
from sos_wsod_tpu.models.heads.contextlocnet import ContextLocNetROIHead


# ------------------------------------------------------------- oracle (C++)
def csc_np(cpgs, labels, preds, rois, fg_threshold=0.1, area_sqrt=True,
           context_scale=1.8):
    """Loop transliteration of csc_cuda.cu:184-548 (single image)."""
    def rnd(v):
        return int(np.floor(v + 0.5))

    num_classes, h, w = cpgs.shape
    n = rois.shape[0]
    W = np.ones((n, num_classes), np.float32)
    for c in range(num_classes):
        if labels[c] < 0.5:
            continue
        binary = (cpgs[c] >= fg_threshold).astype(np.float64)
        integral = binary.cumsum(0).cumsum(1)

        def rect(y0, x0, y1, x1):
            a1 = integral[y1, x1]
            a2 = integral[y1, x0 - 1] if x0 - 1 >= 0 else 0
            a3 = integral[y0 - 1, x1] if y0 - 1 >= 0 else 0
            a4 = integral[y0 - 1, x0 - 1] if (y0 - 1 >= 0 and x0 - 1 >= 0) else 0
            return a1 - a2 - a3 + a4

        scores = np.zeros(n, np.float64)
        for r in range(n):
            ws = min(max(rnd(rois[r, 0]), 0), w - 1)
            hs = min(max(rnd(rois[r, 1]), 0), h - 1)
            we = min(max(rnd(rois[r, 2]), 0), w - 1)
            he = min(max(rnd(rois[r, 3]), 0), h - 1)
            wr, hr = we - ws, he - hs
            wc, hc = (we + ws) / 2.0, (he + hs) / 2.0
            wsi = rnd(wc - wr / context_scale / 2.0)
            hsi = rnd(hc - hr / context_scale / 2.0)
            wei = rnd(wc + wr / context_scale / 2.0)
            hei = rnd(hc + hr / context_scale / 2.0)
            wso = rnd(max(wc - wr * context_scale / 2.0, 0.0))
            hso = rnd(max(hc - hr * context_scale / 2.0, 0.0))
            weo = rnd(min(wc + wr * context_scale / 2.0, w - 1.0))
            heo = rnd(min(hc + hr * context_scale / 2.0, h - 1.0))
            sum_roi = rect(hs, ws, he, we)
            sum_inner = rect(hsi, wsi, hei, wei)
            sum_outer = rect(hso, wso, heo, weo)
            area_roi = (he - hs + 1) * (we - ws + 1)
            area_inner = (hei - hsi + 1) * (wei - wsi + 1)
            area_outer = (heo - hso + 1) * (weo - wso + 1)
            area_frame = max(area_roi - area_inner, 1)
            area_context = max(area_outer - area_roi, 1)
            sf, sc_ = sum_roi - sum_inner, sum_outer - sum_roi
            if area_sqrt:
                scores[r] = sf / np.sqrt(area_frame) - sc_ / np.sqrt(area_context)
            else:
                scores[r] = sf / area_frame - sc_ / area_context

        max_v = max(scores.max(), 0.0)
        min_v = min(scores.min(), 0.0)
        if max_v > 0 and min_v < 0:
            vals = np.where(scores > 0, scores / max_v, scores / (-min_v))
        elif max_v > 0 and min_v == 0:
            vals = scores / max_v
        else:
            vals = np.ones_like(scores)
        W[:, c] = preds[c] * vals + (1 - preds[c])
    return W


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_csc_parity(seed):
    rng = np.random.RandomState(seed)
    c, h, w, n = 4, 48, 64, 24
    cpgs = rng.rand(c, h, w).astype(np.float32)
    labels = (rng.rand(c) > 0.4).astype(np.float32)
    preds = rng.uniform(0.1, 0.95, c).astype(np.float32)
    pts = rng.rand(n, 2) * np.array([w - 12, h - 12])
    wh = rng.rand(n, 2) * 20 + 4
    rois = np.concatenate([pts, pts + wh], 1).astype(np.float32)
    valid = np.ones(n, bool)

    got_w, got_pl, got_nl = csc(jnp.asarray(cpgs), jnp.asarray(labels),
                                jnp.asarray(preds), jnp.asarray(rois),
                                jnp.asarray(valid))
    want = csc_np(cpgs, labels, preds, rois)
    np.testing.assert_allclose(np.asarray(got_w), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_pl), labels)
    np.testing.assert_array_equal(np.asarray(got_nl), np.zeros(c))


def test_csc_absent_class_all_ones():
    cpgs = np.random.RandomState(0).rand(2, 16, 16).astype(np.float32)
    rois = np.array([[2, 2, 10, 10]], np.float32)
    w, _, _ = csc(jnp.asarray(cpgs), jnp.asarray([0.0, 1.0]),
                  jnp.asarray([0.9, 0.9]), jnp.asarray(rois),
                  jnp.asarray([True]))
    assert np.asarray(w)[0, 0] == 1.0


def test_csc_constraint_grad():
    x = jnp.asarray(np.random.RandomState(0).rand(6, 3), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(6, 3), jnp.float32)
    gpos = jax.grad(lambda a: jnp.sum(csc_constraint(a, w, True)))(x)
    np.testing.assert_allclose(np.asarray(gpos),
                               np.maximum(np.asarray(w), 0.0), rtol=1e-6)
    gneg = jax.grad(lambda a: jnp.sum(csc_constraint(a, w, False)))(x)
    np.testing.assert_allclose(np.asarray(gneg),
                               -np.minimum(np.asarray(w), 0.0), rtol=1e-6)


def test_compute_cpg_linear_model():
    """For scores = image @ M summed over pixels, the CPG is |M| per class,
    peak-normalised and gated by label & tau."""
    h, w, ch, c = 8, 8, 3, 2
    rng = np.random.RandomState(0)
    m = rng.randn(ch, c).astype(np.float32)

    def scores_fn(im):  # (h, w, ch) -> (P=hw, C)
        return im.reshape(-1, ch) @ jnp.asarray(m)

    image = jnp.asarray(rng.rand(h, w, ch), jnp.float32)
    gt_oh = jnp.asarray([1.0, 1.0])
    preds = jnp.asarray([0.9, 0.2])
    cpg = compute_cpg(scores_fn, image, gt_oh, preds, tau=0.7)
    assert cpg.shape == (c, h, w)
    # class 1 gated out by tau
    assert np.all(np.asarray(cpg)[1] == 0.0)
    # class 0: gradient is constant max|m[:,0]| per pixel -> normalised to 1
    np.testing.assert_allclose(np.asarray(cpg)[0], 1.0, rtol=1e-5)


def _csc_head_inputs(rng, p=16, classes=3, ch=8, imhw=32):
    pooled = jnp.asarray(rng.rand(p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * (imhw - 12)
    wh = rng.rand(p, 2) * 10 + 2
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    objectness = jnp.asarray(rng.rand(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 2)
    gt_oh = jnp.zeros(classes).at[jnp.asarray([0, 2])].set(1.0)
    cpgs = jnp.asarray(rng.rand(classes, imhw, imhw), jnp.float32)
    return pooled, boxes, objectness, valid, gt_oh, cpgs


def test_csc_head_train_and_grad():
    rng = np.random.RandomState(0)
    pooled, boxes, objectness, valid, gt_oh, cpgs = _csc_head_inputs(rng)
    head = CSCROIHead(num_classes=3, dan_dims=(32, 32))
    use_csc = jnp.asarray(True)
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cpgs, use_csc, method=head.losses)

    def loss_fn(p):
        losses = head.apply(p, pooled, boxes, objectness, valid, gt_oh, cpgs,
                            use_csc, method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_cls_pos", "loss_cls_neg"}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.abs(g).max() > 0 for g in leaves)


def test_csc_head_max_iter_degenerates_to_mil():
    """With use_csc=False, loss_cls_pos equals the plain MIL BCE."""
    rng = np.random.RandomState(1)
    pooled, boxes, objectness, valid, gt_oh, cpgs = _csc_head_inputs(rng)
    head = CSCROIHead(num_classes=3, dan_dims=(32, 32))
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, cpgs, jnp.asarray(True),
                       method=head.losses)
    losses = head.apply(params, pooled, boxes, objectness, valid, gt_oh,
                        cpgs, jnp.asarray(False), method=head.losses,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    from sos_wsod_tpu.models.heads.wsddn import mil_loss

    scores = head.apply(params, pooled, objectness, valid, True,
                        method=head.scores,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    # scores from the train path (dropout rng identical) -> same MIL value
    want = mil_loss(scores, gt_oh, True)
    # the clamp bounds differ (1e-20 vs 1e-6) but scores are interior here
    assert float(losses["loss_cls_pos"]) == pytest.approx(float(want), rel=1e-3)
    assert float(losses["loss_cls_neg"]) == pytest.approx(0.0, abs=1e-6)


def test_contextlocnet_head():
    rng = np.random.RandomState(2)
    p, classes, ch = 12, 4, 8
    pooled3 = jnp.asarray(rng.rand(3 * p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * 60
    wh = rng.rand(p, 2) * 20 + 4
    boxes = jnp.asarray(np.concatenate([pts, pts + wh], 1), jnp.float32)
    objectness = jnp.asarray(rng.rand(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 2)
    gt_oh = jnp.zeros(classes).at[1].set(1.0)

    head = ContextLocNetROIHead(num_classes=classes, dan_dims=(32, 32))
    params = head.init(jax.random.PRNGKey(0), pooled3, objectness, valid,
                       gt_oh, method=head.losses)

    def loss_fn(prm):
        losses = head.apply(prm, pooled3, objectness, valid, gt_oh,
                            method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return losses["loss_cls"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(g).max() > 0 for g in leaves)

    probs, out_boxes = head.apply(params, pooled3, boxes, objectness, valid,
                                  method=head.predict)
    assert probs.shape == (p, classes + 1)
    assert np.all(np.asarray(probs[:, -1]) == 0.0)
