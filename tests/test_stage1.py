import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.models.heads.oicr_plus import label_and_sample, mist_mining
from sos_wsod_tpu.core.matcher import Matcher
from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN

from oracles import nms_np


def _rand_boxes(rng, n, h, w):
    x1 = rng.uniform(0, w - 10, n)
    y1 = rng.uniform(0, h - 10, n)
    x2 = np.minimum(x1 + rng.uniform(5, w / 2, n), w)
    y2 = np.minimum(y1 + rng.uniform(5, h / 2, n), h)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


def mist_oracle(scores, boxes, present, p_frac, thre, nms_thr=0.01):
    """Reference get_pgt_mist semantics (roi_heads_oicrplus.py:560-733)."""
    n = scores.shape[0]
    topk = max(int(n * p_frac), 1)
    seeds = []  # (score, prop_idx, class)
    for c in present:
        order = np.argsort(-scores[:, c], kind="stable")[:topk]
        for r, i in enumerate(order):
            if r == 0 or scores[i, c] >= thre:
                seeds.append((scores[i, c], int(i), int(c)))
    sboxes = np.array([boxes[i] for _, i, _ in seeds], np.float32)
    sscores = np.array([s for s, _, _ in seeds], np.float32)
    keep = nms_np(sboxes, sscores, nms_thr)
    return {(c, i) for keep_i, (_, i, c) in zip(keep, seeds) if keep_i}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mist_mining_parity(seed):
    rng = np.random.RandomState(seed)
    cap, n_valid, k = 64, 40, 20
    boxes = _rand_boxes(rng, cap, 400, 600)
    scores = rng.uniform(0, 0.2, (cap, k)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n_valid] = True
    present = [2, 7, 11]
    oh = np.zeros(k, np.float32)
    oh[present] = 1

    gt = mist_mining(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(oh),
        mist_p=0.10, mist_thre=0.05, seed_cap=64,
    )
    got = {
        (int(c), int(i))
        for c, i, v in zip(np.asarray(gt.classes), np.asarray(gt.index), np.asarray(gt.valid))
        if v
    }
    exp = mist_oracle(scores[:n_valid], boxes[:n_valid], present, 0.10, 0.05)
    assert got == exp


def test_mist_top1_always_kept():
    # all scores below threshold: still one seed per present class (pre-NMS)
    rng = np.random.RandomState(3)
    cap, k = 32, 20
    boxes = _rand_boxes(rng, cap, 300, 300)
    scores = rng.uniform(0, 0.01, (cap, k)).astype(np.float32)
    oh = np.zeros(k, np.float32)
    oh[[0, 5]] = 1
    gt = mist_mining(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.ones(cap, bool), jnp.asarray(oh),
        mist_p=0.10, mist_thre=0.05, seed_cap=32,
    )
    kept_cls = set(np.asarray(gt.classes)[np.asarray(gt.valid)].tolist())
    assert {0, 5} <= kept_cls or len(kept_cls) > 0  # NMS may merge same-box seeds
    # the top-1 seed of each present class entered NMS:
    pre_nms = set(np.asarray(gt.classes)[np.asarray(gt.scores) > -1].tolist())
    assert {0, 5} <= pre_nms


def _iou_np(a, b):
    """d2 pairwise_iou convention (no +1), like reference iou_cal
    (roi_heads_oicrplus.py:499-519)."""
    ax = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ay = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ax * ay
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter) if inter > 0 else 0.0


def wetectron_oracle(scores, boxes, present, p_frac, thre, iou_thre=0.2):
    """Reference get_pgt_mist_mist intended semantics
    (roi_heads_oicrplus.py:481-543): per-class rank list; rank ii kept iff
    IoU vs every higher rank (kept or not) < iou_thre and score >= thre;
    rank 0 always kept. No cross-class NMS."""
    n = scores.shape[0]
    topk = max(int(n * p_frac), 1)
    out = set()
    for c in present:
        order = np.argsort(-scores[:, c], kind="stable")[:topk]
        cboxes = boxes[order]
        for r, i in enumerate(order):
            if r == 0:
                out.add((int(c), int(i)))
                continue
            max_prev = max(_iou_np(cboxes[r], cboxes[j]) for j in range(r))
            if max_prev < iou_thre and scores[i, c] >= thre:
                out.add((int(c), int(i)))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wetectron_mining_parity(seed):
    from sos_wsod_tpu.models.heads.oicr_plus import mist_mining_wetectron

    rng = np.random.RandomState(seed)
    cap, n_valid, k = 64, 40, 20
    boxes = _rand_boxes(rng, cap, 400, 600)
    scores = rng.uniform(0, 0.2, (cap, k)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n_valid] = True
    present = [1, 6, 14]
    oh = np.zeros(k, np.float32)
    oh[present] = 1

    gt = mist_mining_wetectron(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(valid),
        jnp.asarray(oh), mist_p=0.10, mist_thre=0.05, seed_cap=64,
    )
    got = {
        (int(c), int(i))
        for c, i, v in zip(np.asarray(gt.classes), np.asarray(gt.index),
                           np.asarray(gt.valid))
        if v
    }
    exp = wetectron_oracle(scores[:n_valid], boxes[:n_valid], present, 0.10, 0.05)
    assert got == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_top_k_mining_parity(seed):
    from sos_wsod_tpu.models.heads.oicr_plus import top_k_mining

    rng = np.random.RandomState(seed)
    cap, n_valid, k = 48, 30, 20
    boxes = _rand_boxes(rng, cap, 300, 500)
    scores = rng.uniform(0, 1.0, (cap, k)).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n_valid] = True
    present = [0, 9, 19]
    oh = np.zeros(k, np.float32)
    oh[present] = 1

    gt = top_k_mining(jnp.asarray(scores), jnp.asarray(boxes),
                      jnp.asarray(valid), jnp.asarray(oh))
    got = {
        (int(c), int(i))
        for c, i, v in zip(np.asarray(gt.classes), np.asarray(gt.index),
                           np.asarray(gt.valid))
        if v
    }
    # get_pgt_top_k defaults (top_k=1, thres=0): argmax proposal per class
    exp = {(c, int(np.argmax(scores[:n_valid, c]))) for c in present}
    assert got == exp
    w = np.asarray(gt.weights)
    for c in present:
        np.testing.assert_allclose(w[c], scores[:n_valid, c].max(), rtol=1e-6)


def test_mining_dispatch_changes_pgt():
    """Flipping WSL.REFINE_MIST / WSL.MIST_TYPE must change the mined set
    (the round-3 code silently ignored both keys)."""
    from sos_wsod_tpu.models.heads.oicr_plus import (
        mist_mining_wetectron, top_k_mining)

    rng = np.random.RandomState(7)
    cap, k = 64, 20
    boxes = _rand_boxes(rng, cap, 400, 600)
    scores = rng.uniform(0, 0.5, (cap, k)).astype(np.float32)
    valid = np.ones(cap, bool)
    oh = np.zeros(k, np.float32)
    oh[[3, 8]] = 1
    args = (jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(valid),
            jnp.asarray(oh))

    def seeds(gt):
        return {
            (int(c), int(i))
            for c, i, v in zip(np.asarray(gt.classes), np.asarray(gt.index),
                               np.asarray(gt.valid)) if v
        }

    s_nms = seeds(mist_mining(*args, mist_p=0.10, mist_thre=0.05, seed_cap=64))
    s_wet = seeds(mist_mining_wetectron(*args, mist_p=0.10, mist_thre=0.05,
                                        seed_cap=64))
    s_top = seeds(top_k_mining(*args))
    assert s_top != s_nms and s_top != s_wet and s_nms != s_wet
    # top-1 per present class is in every variant's seed set pre-truncation
    assert len(s_top) == 2 and s_top <= s_wet


def test_mist_type_config_plumbed():
    from sos_wsod_tpu.config.defaults import get_default_cfg as get_cfg

    cfg = get_cfg()
    cfg.WSL.MIST_TYPE = "wetectron"
    cfg.WSL.REFINE_MIST = True
    m = MultiInputRCNN.from_cfg(cfg)
    assert m.mist_type == "wetectron" and m.refine_mist is True
    cfg2 = get_cfg()
    cfg2.WSL.MIST_TYPE = "bogus"
    import flax.linen as nn

    m2 = MultiInputRCNN.from_cfg(cfg2, refine_mist=True)
    with pytest.raises(ValueError, match="MIST_TYPE"):
        m2.init(
            {"params": jax.random.PRNGKey(0)},
            {"image": jnp.zeros((32, 32, 3)), "valid_hw": jnp.asarray([32, 32]),
             "boxes": jnp.zeros((8, 4)), "objectness": jnp.zeros(8),
             "prop_valid": jnp.ones(8, bool), "image_hw": jnp.asarray([32, 32])},
        )


def test_label_and_sample_bands():
    # one gt box; proposals at controlled IoUs -> fg / ignore / bg bands
    gt_box = np.array([[100, 100, 200, 200]], np.float32)
    props = np.array(
        [
            [100, 100, 200, 200],   # IoU 1.0 -> fg
            [100, 100, 200, 185],   # IoU 0.85 -> fg
            [100, 100, 200, 155],   # IoU 0.55 -> ignore
            [100, 100, 200, 130],   # IoU 0.30 -> bg
        ],
        np.float32,
    )
    from sos_wsod_tpu.core.instances import GroundTruth

    cap = 8
    gt = GroundTruth(
        boxes=jnp.asarray(np.vstack([gt_box, np.zeros((cap - 1, 4), np.float32)])),
        classes=jnp.asarray(np.array([3] + [0] * (cap - 1), np.int32)),
        scores=jnp.asarray(np.array([0.9] + [0] * (cap - 1), np.float32)),
        weights=jnp.asarray(np.array([0.9] + [0] * (cap - 1), np.float32)),
        index=jnp.asarray(np.zeros(cap, np.int32)),
        valid=jnp.asarray(np.array([True] + [False] * (cap - 1))),
    )
    m = Matcher([0.5, 0.6], [0, -1, 1])
    cls, w, idx, fg = label_and_sample(gt, jnp.asarray(props), jnp.ones(4, bool), m, 20)
    assert np.asarray(cls).tolist() == [3, 3, -1, 20]
    np.testing.assert_allclose(np.asarray(w), [0.9, 0.9, 0.0, 0.9], atol=1e-6)
    assert np.asarray(fg).tolist() == [True, True, False, False]


def _tiny_model(**kw):
    return MultiInputRCNN(
        num_classes=20, seed_cap=32, dan_dims=(64, 64),
        detections_per_image=16, **kw,
    )


def _tiny_batch(rng, p=32, h1=64, w1=96, h2=96, w2=128):
    boxes1 = _rand_boxes(rng, p, h1, w1)
    boxes2 = boxes1 * np.array([w2 / w1, h2 / h1, w2 / w1, h2 / h1], np.float32)
    boxes1f = boxes1.copy()
    boxes1f[:, [0, 2]] = w1 - boxes1[:, [2, 0]]
    boxes2f = boxes2.copy()
    boxes2f[:, [0, 2]] = w2 - boxes2[:, [2, 0]]
    valid = np.ones(p, bool)
    valid[-4:] = False
    oh = np.zeros(20, np.float32)
    oh[[1, 4]] = 1
    return {
        "images_s1": jnp.asarray(rng.uniform(0, 255, (2, h1, w1, 3)).astype(np.float32)),
        "images_s2": jnp.asarray(rng.uniform(0, 255, (2, h2, w2, 3)).astype(np.float32)),
        "valid_hw_s1": jnp.asarray(np.array([[h1, w1], [h1, w1]], np.int32)),
        "valid_hw_s2": jnp.asarray(np.array([[h2, w2], [h2, w2]], np.int32)),
        "boxes": jnp.asarray(np.stack([boxes1, boxes1f, boxes2, boxes2f])),
        "objectness": jnp.asarray(rng.uniform(0, 1, p).astype(np.float32)),
        "prop_valid": jnp.asarray(valid),
        "gt_classes_oh": jnp.asarray(oh),
    }


@pytest.mark.slow
def test_stage1_train_loss_and_grads():
    model = _tiny_model()
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )["params"]

    def loss_fn(p):
        losses = model.apply(
            {"params": p}, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    expected_keys = {"loss_cls"} | {f"loss_cls_r{k}" for k in range(4)} | {
        f"loss_box_reg_r{k}" for k in range(4)
    }
    assert {k for k in losses if k.startswith("loss")} == expected_keys
    # per-branch training metrics ride along under non-"loss" keys
    for k in range(4):
        assert f"fast_rcnn/cls_accuracy_r{k}" in losses
        assert f"roi_head/num_fg_samples_r{k}" in losses
        assert 0.0 <= float(losses[f"fast_rcnn/cls_accuracy_r{k}"]) <= 1.0
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # frozen stages get zero grads via stop_gradient
    g1 = grads["backbone"]["plain1"]["conv1"]["kernel"]
    assert float(jnp.abs(g1).max()) == 0.0
    g5 = grads["backbone"]["plain5"]["conv1"]["kernel"]
    assert float(jnp.abs(g5).max()) > 0.0


def test_stage1_inference_shapes():
    model = _tiny_model()
    rng = np.random.RandomState(1)
    p, h, w = 32, 64, 96
    boxes = _rand_boxes(rng, p, h, w)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32)),
        "valid_hw": jnp.asarray(np.array([h, w], np.int32)),
        "boxes": jnp.asarray(boxes),
        "objectness": jnp.asarray(rng.uniform(0, 1, p).astype(np.float32)),
        "prop_valid": jnp.asarray(np.ones(p, bool)),
        "image_hw": jnp.asarray(np.array([h, w], np.float32)),
    }
    tb = _tiny_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, tb, train=True
    )["params"]
    det, all_scores, all_boxes = model.apply({"params": params}, batch, train=False)
    assert det.boxes.shape == (16, 4)
    assert all_scores.shape == (p, 21)
    assert all_boxes.shape == (p, 80)
    s = np.asarray(all_scores)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-4)  # mean of softmaxes
    assert np.asarray(det.valid).sum() > 0


@pytest.mark.slow
def test_oicrplus_bbox_update():
    """OICRPLUS.BBOX_UPDATE: flip-consistent delta averaging feeds regressed
    boxes to the next branch's mining; losses stay finite and grads flow."""
    import jax
    import jax.numpy as jnp
    from sos_wsod_tpu.models.heads.oicr_plus import OICRPlusHead

    rng = np.random.RandomState(0)
    v, p, classes, ch = 4, 24, 4, 8
    pooled = jnp.asarray(rng.rand(v, p, 7, 7, ch), jnp.float32)
    pts = rng.rand(p, 2) * 60
    wh = rng.rand(p, 2) * 20 + 4
    b0 = np.concatenate([pts, pts + wh], 1).astype(np.float32)
    boxes = jnp.asarray(np.stack([b0, b0 + 1, b0 * 0.8, b0 * 0.8 + 1]))
    objectness = jnp.asarray(rng.rand(p), jnp.float32)
    valid = jnp.asarray(np.arange(p) < p - 3)
    gt_oh = jnp.zeros(classes).at[jnp.asarray([1, 3])].set(1.0)

    head = OICRPlusHead(num_classes=classes, refine_k=2,
                        refine_reg=(True, True), bbox_update=True,
                        fused_pool=True, seed_cap=16, dan_dims=(32, 32))
    params = head.init(jax.random.PRNGKey(0), pooled, boxes, objectness,
                       valid, gt_oh, method=head.losses)

    def loss_fn(prm):
        losses = head.apply(prm, pooled, boxes, objectness, valid, gt_oh,
                            method=head.losses,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert "loss_box_reg_r1" in losses
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
