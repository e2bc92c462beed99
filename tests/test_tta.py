"""TTA wrappers: view generation, inverse transforms, AVG/UNION strategies."""
import numpy as np

from sos_wsod_tpu.data import transforms as T
from sos_wsod_tpu.models.tta import tta_avg_scores, tta_union_detections


def test_inverse_box_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.abs(rng.randn(5, 4)) * 50
    boxes[:, 2:] += boxes[:, :2] + 5
    h, w = 200, 300
    tl = T.TransformList([
        T.CropTransform(10, 20, 150, 250, h, w),
        T.resize_shortest_edge(150, 250, [100], 400, None),
        T.HFlipTransform(*T.resize_shortest_edge(150, 250, [100], 400, None).output_size),
    ])
    fwd = tl.apply_box(boxes.astype(np.float32))
    back = tl.inverse_box(fwd)
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-3)


def test_tta_avg_identity_model():
    """A model returning constant scores and the input proposal boxes as
    class-boxes: AVG must return those constants and the ORIGINAL-coord boxes."""
    rng = np.random.RandomState(1)
    h, w, p, k = 60, 80, 16, 3
    image = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    raw_boxes = np.array([[5, 5, 30, 30]] * p, np.float32)
    raw_logits = np.ones(p, np.float32)

    def predict_fn(batch):
        scores = np.full((p, k + 1), 0.25)
        boxes = np.tile(batch["boxes"][:, :4], (1, k))
        return scores, boxes

    scores, boxes, valid = tta_avg_scores(
        predict_fn, image, raw_boxes, raw_logits,
        min_sizes=[48, 56], flip=True, capacity=p, size_divisibility=16,
    )
    np.testing.assert_allclose(scores, 0.25)
    np.testing.assert_allclose(boxes[0][:4], [5, 5, 30, 30], atol=0.5)
    assert valid.all()


def test_tta_union_dedups_views():
    rng = np.random.RandomState(2)
    h, w, p = 60, 80, 4
    image = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    raw_boxes = np.array([[5, 5, 30, 30]] * p, np.float32)
    raw_logits = np.ones(p, np.float32)

    def infer_fn(batch):
        # one detection: the first proposal box, class 2
        return (
            batch["boxes"][:1],
            np.array([0.9]),
            np.array([2]),
            np.array([True]),
        )

    boxes, scores, classes = tta_union_detections(
        infer_fn, image, raw_boxes, raw_logits,
        min_sizes=[48, 56], flip=True, capacity=p, size_divisibility=16,
        nms_thresh=0.5, topk=10,
    )
    # 4 views all produce the same original-coords box -> NMS keeps one
    assert len(scores) == 1
    np.testing.assert_allclose(boxes[0], [5, 5, 30, 30], atol=0.5)
    assert classes[0] == 2
