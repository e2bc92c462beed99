"""Weight-converter mapping tests + numpy COCO evaluator sanity tests."""
import pickle

import numpy as np
import pytest

from sos_wsod_tpu.engine.weights import (
    load_pkl,
    merge_pretrained,
    resnet_c2_param_tree,
    vgg_wsl_param_tree,
)
from sos_wsod_tpu.evaluation.coco_eval import COCOEvaluator, bbox_iou_xyxy


def test_vgg_wsl_mapping(tmp_path):
    rng = np.random.RandomState(0)
    blobs = {
        "backbone.plain1.conv1.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "backbone.plain1.conv1.bias": rng.randn(64).astype(np.float32),
        "roi_heads.box_head.fc1.weight": rng.randn(128, 64).astype(np.float32),
        "roi_heads.box_head.fc1.bias": rng.randn(128).astype(np.float32),
        "roi_heads.box_predictor.cls.weight": rng.randn(20, 128).astype(np.float32),
        "roi_heads.box_predictor.cls.bias": rng.randn(20).astype(np.float32),
        "roi_heads.box_refinery_0.cls_score.weight": rng.randn(21, 128).astype(np.float32),
        "roi_heads.box_refinery_0.cls_score.bias": rng.randn(21).astype(np.float32),
    }
    path = tmp_path / "w.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": blobs}, f)
    tree = vgg_wsl_param_tree(load_pkl(str(path)))
    k = tree["backbone"]["plain1"]["conv1"]["kernel"]
    assert k.shape == (3, 3, 3, 64)  # OIHW -> HWIO
    np.testing.assert_allclose(
        k[1, 2, 0, 5], blobs["backbone.plain1.conv1.weight"][5, 0, 1, 2]
    )
    fc = tree["roi_heads"]["dan"]["fc1"]["kernel"]
    assert fc.shape == (64, 128)
    assert tree["roi_heads"]["wsddn"]["cls"]["kernel"].shape == (128, 20)
    assert tree["roi_heads"]["box_refinery_0"]["cls_score"]["kernel"].shape == (128, 21)


def test_resnet_c2_mapping():
    rng = np.random.RandomState(1)
    blobs = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.randn(64).astype(np.float32),
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_w": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch1_w": rng.randn(256, 64, 1, 1).astype(np.float32),
        "res2_0_branch1_bn_s": rng.randn(256).astype(np.float32),
        "res2_0_branch1_bn_b": rng.randn(256).astype(np.float32),
    }
    tree = resnet_c2_param_tree(blobs)
    assert tree["stem"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    norm = tree["res2_block0"]["conv1_norm"]
    np.testing.assert_allclose(norm["weight"], blobs["res2_0_branch2a_bn_s"])
    np.testing.assert_allclose(norm["running_mean"], 0)
    np.testing.assert_allclose(norm["running_var"], 1)
    assert tree["res2_block0"]["shortcut"]["kernel"].shape == (1, 1, 64, 256)


def test_merge_pretrained_shape_guard():
    params = {"a": {"w": np.zeros((2, 2))}, "b": np.zeros(3)}
    merged = merge_pretrained(params, {"a": {"w": np.ones((2, 2))}})
    np.testing.assert_allclose(merged["a"]["w"], 1)
    np.testing.assert_allclose(merged["b"], 0)
    with pytest.raises(AssertionError):
        merge_pretrained(params, {"a": {"w": np.ones((3, 3))}})


def _ann(boxes, classes):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {
        "boxes": boxes,
        "classes": np.asarray(classes, np.int64),
        "areas": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
    }


def test_coco_eval_perfect_detections():
    anns = {
        1: _ann([[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1]),
        2: _ann([[5, 5, 45, 40]], [0]),
    }
    ev = COCOEvaluator("test", annotations=anns, num_classes=2)
    ev.process_single(1, [[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [0, 1])
    ev.process_single(2, [[5, 5, 45, 40]], [0.95], [0])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)


def test_coco_eval_localization_quality():
    # detection at IoU ~0.58: counts at IoU .5/.55 only
    anns = {1: _ann([[0, 0, 100, 100]], [0])}
    ev = COCOEvaluator("test", annotations=anns, num_classes=1)
    ev.process_single(1, [[0, 0, 100, 58]], [0.9], [0])
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0 < res["AP"] < 100

    iou = bbox_iou_xyxy(np.array([[0, 0, 100, 58.0]]), np.array([[0, 0, 100, 100.0]]))
    assert 0.55 < iou[0, 0] < 0.6


def test_coco_eval_false_positive_penalty():
    anns = {1: _ann([[0, 0, 50, 50]], [0])}
    ev = COCOEvaluator("test", annotations=anns, num_classes=1)
    # high-scoring FP then TP: precision at recall 1 is 0.5
    ev.process_single(1, [[200, 200, 250, 250], [0, 0, 50, 50]], [0.95, 0.9], [0, 0])
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == pytest.approx(50.0, abs=1.0)


def test_coco_eval_detection_result_dump(tmp_path):
    anns = {1: _ann([[0, 0, 50, 50]], [0])}
    path = tmp_path / "det_{}.json"
    ev = COCOEvaluator(
        "cocotest", annotations=anns, num_classes=1,
        save_detection_result=True, save_path=str(path),
    )
    ev.process_single(1, [[0, 0, 50, 50]], [0.9], [0])
    ev.evaluate()
    import json

    dumped = json.load(open(str(path).format("cocotest")))
    assert dumped[0]["category_id"] == 1  # 1-based
    assert dumped[0]["image_id"] == 1


def test_torchvision_vgg16_mapping():
    from sos_wsod_tpu.engine.weights import torchvision_vgg16_param_tree

    rng = np.random.RandomState(0)
    sd = {
        "features.0.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "features.0.bias": rng.randn(64).astype(np.float32),
        "features.28.weight": rng.randn(512, 512, 3, 3).astype(np.float32),
        "features.28.bias": rng.randn(512).astype(np.float32),
        "classifier.0.weight": rng.randn(8, 2 * 7 * 7).astype(np.float32),
        "classifier.0.bias": rng.randn(8).astype(np.float32),
    }
    tree = torchvision_vgg16_param_tree(sd)
    assert tree["backbone"]["plain1"]["conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert tree["backbone"]["plain5"]["conv3"]["kernel"].shape == (3, 3, 512, 512)
    # fc1 gets the channels-last input permutation: torch index c*49+p maps
    # to row p*C+c
    fc1 = tree["roi_heads"]["dan"]["fc1"]["kernel"]
    assert fc1.shape == (98, 8)
    w = sd["classifier.0.weight"]
    np.testing.assert_allclose(fc1[3 * 2 + 1], w[:, 1 * 49 + 3])


def test_coco_eval_crowd_absorbs_detections():
    """Crowd gts are ignore regions: dets matching them (by inter/det-area)
    are neither TP nor FP, and any number may match one crowd region."""
    anns = {
        1: {
            "boxes": np.asarray([[0.0, 0, 50, 50], [100, 100, 300, 300]]),
            "classes": np.asarray([0, 0], np.int64),
            "areas": np.asarray([2500.0, 40000.0]),
            "crowd": np.asarray([False, True]),
        }
    }
    ev = COCOEvaluator("test", annotations=anns, num_classes=1)
    # TP + two dets fully inside the crowd region (would be FPs otherwise)
    ev.process_single(
        1,
        [[0, 0, 50, 50], [110, 110, 150, 150], [200, 200, 250, 250]],
        [0.9, 0.95, 0.85],
        [0, 0, 0],
    )
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP"] == pytest.approx(100.0)

    # same dets without the crowd flag: the high-scoring FP caps precision
    anns_nc = {k: dict(v, crowd=np.zeros(2, bool)) for k, v in anns.items()}
    ev2 = COCOEvaluator("test", annotations=anns_nc, num_classes=1)
    ev2.process_single(
        1,
        [[0, 0, 50, 50], [110, 110, 150, 150], [200, 200, 250, 250]],
        [0.9, 0.95, 0.85],
        [0, 0, 0],
    )
    assert ev2.evaluate()["bbox"]["AP50"] < 60.0


def test_coco_eval_area_range_boundaries_inclusive():
    """pycocotools ignores gt iff area < lo or area > hi — both bounds
    inclusive, so area == 32^2 counts for BOTH small and medium."""
    # a 32x32 box: area exactly 1024
    anns = {1: {
        "boxes": np.asarray([[0.0, 0, 32, 32]]),
        "classes": np.asarray([0], np.int64),
        "areas": np.asarray([1024.0]),
        "crowd": np.asarray([False]),
    }}
    ev = COCOEvaluator("test", annotations=anns, num_classes=1)
    ev.process_single(1, [[0, 0, 32, 32]], [0.9], [0])
    res = ev.evaluate()["bbox"]
    assert res["APs"] == pytest.approx(100.0)
    assert res["APm"] == pytest.approx(100.0)
    assert np.isnan(res["APl"])


def test_coco_eval_ignored_det_matched_to_out_of_range_gt():
    """A det matched to an area-ignored gt is ignored, not an FP."""
    anns = {1: {
        "boxes": np.asarray([[0.0, 0, 200, 200], [300, 300, 310, 310]]),
        "classes": np.asarray([0, 0], np.int64),
        "areas": np.asarray([40000.0, 100.0]),
        "crowd": np.asarray([False, False]),
    }}
    ev = COCOEvaluator("test", annotations=anns, num_classes=1)
    ev.process_single(1, [[0, 0, 200, 200], [300, 300, 310, 310]], [0.95, 0.9], [0, 0])
    res = ev.evaluate()["bbox"]
    # small range: only the tiny gt is live; the big det matches an ignored gt
    assert res["APs"] == pytest.approx(100.0)
    assert res["APl"] == pytest.approx(100.0)
