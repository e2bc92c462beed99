"""Host-side glue tools: PGF + add_multi_label parity behavior tests
(reference semantics documented in tools/pgf.py, tools/add_multi_label.py)."""
import copy
import json

import numpy as np
import pytest

from sos_wsod_tpu.tools.pgf import (
    DIFF_CLASSES,
    build_result_and_labels,
    class_filter,
    contain_cal,
    pgf,
)
from sos_wsod_tpu.tools.add_multi_label import get_multi_class_label


def reference_contain_cal(a_, b_):
    # transliteration of the reference arithmetic (pgf.py:209-219) as oracle
    a = list(a_)
    b = list(b_)
    a = [a[0], a[1], a[2] + a[0], a[3] + a[1]]
    b = [b[0], b[1], b[2] + b[0], b[3] + b[1]]
    c = [max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3])]
    area_c = max(0, c[2] - c[0]) * max(0, c[3] - c[1])
    area_a = max(0, a[2] - a[0]) * max(0, a[3] - a[1])
    return area_c / (area_a + 1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_contain_cal_matches_reference(seed):
    rng = np.random.RandomState(seed)
    for _ in range(50):
        a = rng.uniform(0, 300, 4).tolist()
        b = rng.uniform(0, 300, 4).tolist()
        assert contain_cal(a, b) == pytest.approx(reference_contain_cal(a, b))


def test_class_filter_drops_wrong_classes():
    result = {
        1: [
            {"category_id": 0, "score": 0.9, "bbox": [0, 0, 10, 10]},
            {"category_id": 3, "score": 0.8, "bbox": [0, 0, 10, 10]},
        ]
    }
    class_filter(result, {1: [0]}, "t")
    assert [p["category_id"] for p in result[1]] == [0]


def test_pgf_first_per_class_always_kept_and_tkeep():
    # first det of class 2 kept despite low score; second low-score dropped;
    # high-score second kept
    result = {
        1: [
            {"category_id": 2, "score": 0.05, "bbox": [0, 0, 10, 10]},
            {"category_id": 2, "score": 0.1, "bbox": [100, 100, 150, 150]},
            {"category_id": 2, "score": 0.5, "bbox": [200, 200, 290, 290]},
        ]
    }
    pgf(result, "t", t_con=0.85, t_keep=0.2, use_diff=False, diff_classes=DIFF_CLASSES)
    scores = [p["score"] for p in result[1]]
    assert 0.05 in scores and 0.5 in scores and 0.1 not in scores


def test_pgf_containment_drop_and_diff_class_skip():
    # box a fully "contained" in b under the reference's xywh-style arithmetic
    a = [10.0, 10.0, 20.0, 20.0]
    b = [0.0, 0.0, 200.0, 200.0]
    assert contain_cal(a, b) >= 0.85
    base = [
        {"category_id": 0, "score": 0.9, "bbox": list(b)},
        {"category_id": 0, "score": 0.8, "bbox": list(a)},
    ]
    result = {1: copy.deepcopy(base)}
    pgf(result, "t", 0.85, 0.2, False, DIFF_CLASSES)
    assert len(result[1]) == 1 and result[1][0]["bbox"] == b

    # same boxes under a 'difficult' class survive when use_diff is False
    for p in base:
        p["category_id"] = DIFF_CLASSES[0]
    result = {1: copy.deepcopy(base)}
    pgf(result, "t", 0.85, 0.2, False, DIFF_CLASSES)
    assert len(result[1]) == 2


def test_build_result_shifts_category_and_drops_unknown_images():
    dataset = [{"image_id": "000001", "annotations": [{"category_id": 4, "bbox": [0, 0, 5, 5]}]}]
    detections = [
        {"image_id": 1, "category_id": 5, "score": 0.7, "bbox": [0, 0, 5, 5]},
        {"image_id": 99, "category_id": 1, "score": 0.7, "bbox": [0, 0, 5, 5]},
    ]
    result, class_dict = build_result_and_labels(dataset, detections)
    assert list(result) == [1]
    assert result[1][0]["category_id"] == 4  # 1-based -> 0-based
    assert class_dict[1] == [4]


def test_multi_label_order_preserved():
    dataset = [
        {
            "image_id": "000007",
            "annotations": [
                {"category_id": 3}, {"category_id": 1}, {"category_id": 3}, {"category_id": 0}
            ],
        }
    ]
    labels = get_multi_class_label(dataset)
    assert labels == {"7": [3, 1, 0]}  # first-seen order, like the reference
