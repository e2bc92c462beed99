"""Tests for proposal conversion (MAT -> pkl) and recall analysis."""
import numpy as np
import pytest

from sos_wsod_tpu.tools.proposals_convert import (convert_mcg_box,
                                                  convert_ss_box,
                                                  proposal_recall)


def test_convert_ss_box(tmp_path):
    import scipy.io as sio

    # two images, MAT boxes 1-indexed (y1, x1, y2, x2)
    b0 = np.array([[2, 3, 12, 13], [1, 1, 5, 6]], np.float64)
    b1 = np.array([[4, 5, 20, 21]], np.float64)
    raw = np.empty(2, object)
    raw[0], raw[1] = b0, b1
    path = tmp_path / "ss.mat"
    sio.savemat(path, {"boxes": raw})
    dicts = [{"image_id": "000001"}, {"image_id": "000002"}]
    out = convert_ss_box("voc_2007_train", dicts, str(path))
    assert out["indexes"] == ["000001", "000002"]
    np.testing.assert_array_equal(out["boxes"][0],
                                  np.array([[2, 1, 12, 11], [0, 0, 5, 4]],
                                           np.int16))
    assert out["boxes"][0].dtype == np.int16
    np.testing.assert_array_equal(out["scores"][0], [1.0, 1.0])


def test_convert_mcg_box(tmp_path):
    import scipy.io as sio

    sio.savemat(tmp_path / "000001.mat",
                {"boxes": np.array([[2, 3, 12, 13]], np.float64),
                 "scores": np.array([[0.7]], np.float64)})
    dicts = [{"image_id": "000001", "file_name": "x/000001.jpg"}]
    out = convert_mcg_box("voc_2007_train", dicts, str(tmp_path))
    np.testing.assert_array_equal(out["boxes"][0], [[2, 1, 12, 11]])
    np.testing.assert_allclose(out["scores"][0], 0.7)


def test_proposal_recall():
    dicts = [{
        "image_id": "im0",
        "annotations": [
            {"bbox": [10, 10, 50, 50]},   # covered at IoU 1.0
            {"bbox": [100, 100, 140, 140]},  # covered loosely (IoU ~0.83)
        ],
    }]
    props = {
        "indexes": ["im0"],
        "boxes": [np.array([[10, 10, 50, 50], [98, 98, 138, 138]], np.int16)],
        "scores": [np.array([1.0, 1.0], np.float32)],
    }
    rec = proposal_recall(dicts, props, iou_thresholds=(0.5, 0.95))
    assert rec[0] == pytest.approx(1.0)     # both matched at 0.5
    assert rec[1] == pytest.approx(0.5)     # only the exact box at 0.95
    # top-k truncation: keep only the (higher-score) far box
    props2 = {
        "indexes": ["im0"],
        "boxes": [np.array([[98, 98, 138, 138], [10, 10, 50, 50]], np.int16)],
        "scores": [np.array([0.9, 0.1], np.float32)],
    }
    rec2 = proposal_recall(dicts, props2, iou_thresholds=(0.95,), max_num_box=1)
    assert rec2[0] == pytest.approx(0.0)
