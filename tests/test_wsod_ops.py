"""Parity tests for the WSOD-specific native-op equivalents: PCL loss and
ROIMerge. Oracles are direct numpy transliterations of the reference C++
kernels (pcl_loss_cpu.cpp, ROIMerge_cpu.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sos_wsod_tpu.ops.pcl_loss import pcl_loss
from sos_wsod_tpu.ops.roi_merge import roi_merge, roi_merge_assign, getlambda


# ---------------------------------------------------------------- PCL oracle
def pcl_loss_forward_np(pcl_probs, labels, cls_loss_weights, pc_labels,
                        pc_probs, img_cls_loss_weights, im_labels):
    """pcl_loss_cpu.cpp:8-57 loop-for-loop."""
    batch, channels = pcl_probs.shape
    eps = 1e-6
    out = np.zeros(channels, np.float64)
    for c in range(channels):
        if im_labels[c] == 0:
            continue
        if c == 0:
            for i in range(batch):
                if labels[i] == 0:
                    out[c] -= cls_loss_weights[i] * np.log(max(pcl_probs[i, 0], eps))
        else:
            for i in range(pc_labels.shape[0]):
                if pc_labels[i] == c:
                    out[c] -= img_cls_loss_weights[i] * np.log(max(pc_probs[i], eps))
    return out


def pcl_loss_backward_np(pcl_probs, labels, cls_loss_weights, gt_assignment,
                         pc_labels, pc_probs, pc_count, img_cls_loss_weights,
                         im_labels):
    """pcl_loss_cpu.cpp:59-117."""
    batch, channels = pcl_probs.shape
    eps = 1e-5
    grad = np.zeros_like(pcl_probs, np.float64)
    for i in range(batch):
        for c in range(channels):
            if im_labels[c] == 0:
                continue
            if c == 0:
                if labels[i] == 0:
                    grad[i, c] = -cls_loss_weights[i] / max(pcl_probs[i, 0], eps)
            elif labels[i] == c:
                pc = int(gt_assignment[i])
                grad[i, c] = -img_cls_loss_weights[pc] / max(
                    pc_count[pc] * pc_probs[pc], eps)
    return grad


def _pcl_case(seed, r=60, c=6, npos=10):
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.ones(c), size=r).astype(np.float32)
    im_labels = np.zeros(c, np.float32)
    im_labels[0] = 1.0
    present = rng.choice(np.arange(1, c), size=2, replace=False)
    im_labels[present] = 1.0
    pc_labels = rng.choice(present, size=npos).astype(np.int32)
    # per-proposal labels: bg (0) or one of the present classes
    labels = np.where(rng.rand(r) < 0.5, 0,
                      pc_labels[rng.randint(npos, size=r)]).astype(np.int32)
    gt_assignment = rng.randint(npos, size=r).astype(np.int32)
    # the kernel asserts pc_labels[gt_assignment[i]] == labels[i] for fg rows;
    # construct assignments consistently
    for i in range(r):
        if labels[i] != 0:
            choices = np.where(pc_labels == labels[i])[0]
            gt_assignment[i] = rng.choice(choices)
    pc_probs = rng.uniform(0.05, 0.95, npos).astype(np.float32)
    pc_count = rng.randint(1, 8, npos).astype(np.float32)
    cls_w = rng.uniform(0.1, 1.0, r).astype(np.float32)
    img_w = rng.uniform(0.1, 1.0, npos).astype(np.float32)
    return (probs, labels, cls_w, gt_assignment, pc_labels, pc_probs,
            pc_count, img_w, im_labels)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pcl_loss_forward_parity(seed):
    args = _pcl_case(seed)
    (probs, labels, cls_w, gt_assignment, pc_labels, pc_probs, pc_count,
     img_w, im_labels) = args
    got = pcl_loss(*[jnp.asarray(a) for a in args])
    want = pcl_loss_forward_np(probs, labels, cls_w, pc_labels, pc_probs,
                               img_w, im_labels)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_pcl_loss_backward_parity(seed):
    args = _pcl_case(seed)
    (probs, labels, cls_w, gt_assignment, pc_labels, pc_probs, pc_count,
     img_w, im_labels) = args

    def f(p):
        return jnp.sum(pcl_loss(p, *[jnp.asarray(a) for a in args[1:]]))

    got = jax.grad(f)(jnp.asarray(probs))
    want = pcl_loss_backward_np(probs, labels, cls_w, gt_assignment,
                                pc_labels, pc_probs, pc_count, img_w,
                                im_labels)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_pcl_loss_absent_class_zero():
    args = _pcl_case(7)
    im_labels = np.array(args[-1])
    absent = np.where(im_labels == 0)[0]
    out = np.asarray(pcl_loss(*[jnp.asarray(a) for a in args]))
    assert np.all(out[absent] == 0.0)


# ------------------------------------------------------------ ROIMerge oracle
def roi_merge_assign_np(scores, iou, cur_iter, max_epoch, size_epoch):
    """ROIMerge_cpu.cpp:94-160 transliteration."""
    num_roi = scores.shape[0]
    order = sorted(range(num_roi), key=lambda i: -scores[i])
    lam = getlambda(cur_iter / size_epoch, float(max_epoch))
    ids = [-1] * num_roi
    top_k = min(num_roi, 200)
    cur_id = 0
    for t in range(top_k):
        n = order[t]
        if ids[n] != -1:
            continue
        ids[n] = cur_id
        end_num = min(t + 40, top_k)
        for tt in range(t, end_num):
            i = order[tt]
            if ids[i] != -1:
                continue
            ok = True
            for ttt in range(t, end_num):
                j = order[ttt]
                if ids[j] != cur_id:
                    continue
                if iou[i, j] < lam:
                    ok = False
                    break
            if ok:
                ids[i] = cur_id
        cur_id += 1
    for n in range(num_roi):
        if ids[n] == -1:
            ids[n] = cur_id
            cur_id += 1
    return np.array(ids, np.int32), cur_id


def _merge_case(seed, r=64, k=5):
    rng = np.random.RandomState(seed)
    scores = rng.rand(r).astype(np.float32)
    pts = rng.rand(r, 2) * 100
    wh = rng.rand(r, 2) * 40 + 5
    boxes = np.concatenate([pts, pts + wh], 1).astype(np.float32)
    x1 = np.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = np.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = np.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = np.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iou = (inter / (area[:, None] + area[None, :] - inter)).astype(np.float32)
    C = rng.rand(r, k).astype(np.float32)
    D = rng.rand(r, k).astype(np.float32)
    return scores, iou, C, D


@pytest.mark.parametrize("seed,cur_iter", [(0, 100), (1, 5000), (2, 20000)])
def test_roi_merge_assignment_parity(seed, cur_iter):
    scores, iou, _, _ = _merge_case(seed)
    ids, num_id = roi_merge_assign_np(scores, iou, cur_iter, 20, 5000)
    got_ids, got_counts = roi_merge_assign(scores, iou, cur_iter, 20, 5000)
    np.testing.assert_array_equal(got_ids, ids)
    want_counts = np.bincount(ids, minlength=scores.shape[0])
    np.testing.assert_array_equal(got_counts, want_counts)


def test_roi_merge_forward_and_grad():
    scores, iou, C, D = _merge_case(3)
    r, k = C.shape
    ids, num_id = roi_merge_assign_np(scores, iou, 100, 20, 5000)
    counts = np.bincount(ids, minlength=r).astype(np.float32)

    mc, md, got_ids, got_counts = roi_merge(
        jnp.asarray(scores), jnp.asarray(iou), jnp.asarray(C), jnp.asarray(D),
        100, 20, 5000)
    # oracle mean-merge (ROIMerge_cpu.cpp:196-203)
    want_mc = np.zeros((r, k), np.float32)
    want_md = np.zeros((r, k), np.float32)
    for n in range(r):
        want_mc[ids[n]] += C[n] / counts[ids[n]]
        want_md[ids[n]] += D[n] / counts[ids[n]]
    np.testing.assert_allclose(np.asarray(mc), want_mc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(md), want_md, rtol=1e-5, atol=1e-6)

    # backward: grad spreads uniformly, grad_C[n] = top_grad[ids[n]] / IC[ids[n]]
    top = np.random.RandomState(0).rand(r, k).astype(np.float32)

    def f(c):
        mc2, _, _, _ = roi_merge(jnp.asarray(scores), jnp.asarray(iou), c,
                                 jnp.asarray(D), 100, 20, 5000)
        return jnp.sum(mc2 * jnp.asarray(top))

    got_grad = np.asarray(jax.grad(f)(jnp.asarray(C)))
    want_grad = top[ids] / counts[ids][:, None]
    np.testing.assert_allclose(got_grad, want_grad, rtol=1e-5, atol=1e-6)


def test_roi_merge_lambda_schedule():
    # lambda grows from ~0 to 1 across training (ROIMerge_cpu.cpp:11-17)
    assert getlambda(0.0, 20.0) == 0.0
    assert abs(getlambda(20.0, 20.0) - 1.0) < 1e-6
    assert getlambda(1.0, 20.0) < getlambda(10.0, 20.0)
