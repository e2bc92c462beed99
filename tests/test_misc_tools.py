"""Tests for the PGT->JSON converter and the visualization tool."""
import json
import os

import numpy as np
import pytest

from sos_wsod_tpu.tools.pgt_to_json import (build_coco_json,
                                            detections_to_annotations,
                                            image_infos, read_positive_ids)
from sos_wsod_tpu.tools.visualize import (draw_detections,
                                          visualize_json_results)


def _write(p, text):
    with open(p, "w") as f:
        f.write(text)


def test_pgt_to_json(tmp_path):
    classes = ("cat", "dog")
    # detections: img 000001 has two cat dets (keep FIRST), 000002 one dog
    _write(tmp_path / "det_cat.txt",
           "000001 0.9 10 10 50 50\n000001 0.8 12 12 40 40\n"
           "000003 0.9 5 5 9 9\n")
    _write(tmp_path / "det_dog.txt", "000002 0.7 20 20 80 100\n")
    # positives: cat in 000001 only (000003 negative); dog in 000002
    _write(tmp_path / "cat_train.txt", "000001 1\n000002 -1\n000003 -1\n")
    _write(tmp_path / "dog_train.txt", "000001 -1\n000002 1\n000003 -1\n")

    assert read_positive_ids(str(tmp_path / "cat_train.txt")) == ["000001"]
    anns = detections_to_annotations(
        str(tmp_path / "det_{}.txt"), str(tmp_path / "{}_train.txt"),
        classes=classes)
    assert len(anns) == 2
    a0 = anns[0]
    assert a0["image_id"] == "000001" and a0["category_id"] == 1
    assert a0["bbox"] == [10, 10, 40, 40]     # xywh ints
    assert a0["area"] == 1600 and a0["iscrowd"] == 0
    assert anns[1]["category_id"] == 2

    # image infos + full json assembly
    from PIL import Image

    imgdir = tmp_path / "imgs"
    os.makedirs(imgdir)
    for i in ("000001", "000002"):
        Image.new("RGB", (64, 48)).save(imgdir / f"{i}.jpg")
    infos = image_infos(str(imgdir), ["000001", "000002"])
    assert infos[0] == {"file_name": "000001.jpg", "height": 48,
                        "width": 64, "id": "000001"}
    coco = build_coco_json(anns, infos)
    assert set(coco) == {"images", "annotations", "categories", "type"}


def test_visualize_json_results(tmp_path):
    from PIL import Image

    imgdir = tmp_path / "imgs"
    outdir = tmp_path / "out"
    os.makedirs(imgdir)
    Image.new("RGB", (100, 80), (30, 30, 30)).save(imgdir / "000001.jpg")
    results = [
        {"image_id": "000001", "category_id": 1, "score": 0.9,
         "bbox": [10, 10, 50, 40]},
        {"image_id": "000001", "category_id": 2, "score": 0.2,   # below thr
         "bbox": [0, 0, 5, 5]},
    ]
    with open(tmp_path / "res.json", "w") as f:
        json.dump(results, f)
    n = visualize_json_results(str(tmp_path / "res.json"), str(imgdir),
                               str(outdir), ["cat", "dog"], 0.5)
    assert n == 1
    out = np.asarray(Image.open(outdir / "000001.jpg"))
    assert out.shape == (80, 100, 3)
    assert out.sum() > np.asarray(Image.open(imgdir / "000001.jpg")).sum()


def test_draw_detections_smoke():
    from PIL import Image

    img = draw_detections(Image.new("RGB", (40, 40)), [[5, 5, 20, 20]],
                          ["cat"], [0.8])
    assert np.asarray(img).sum() > 0


def test_imagenet_trainer_smoke():
    import sys
    sys.path.insert(0, "tools")
    from train_imagenet import main

    state = main(["--arch", "vgg16", "--num-classes", "4",
                  "--batch-size", "2", "--image-size", "64",
                  "--max-iter", "2", "--log-period", "1",
                  "--synthetic", "--dtype", "float32"])
    assert "params" in state


def test_verify_results():
    import pytest as _pt
    from sos_wsod_tpu.config import get_cfg
    from sos_wsod_tpu.evaluation.testing import (flatten_results_dict,
                                                 verify_results)

    cfg = get_cfg()
    results = {"bbox": {"AP50": 54.1, "AP": 26.2}}
    assert flatten_results_dict(results) == {"bbox/AP50": 54.1, "bbox/AP": 26.2}
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP50", 54.0, 0.5]]
    assert verify_results(cfg, results)
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP50", 60.0, 0.5]]
    with _pt.raises(AssertionError):
        verify_results(cfg, results)
    cfg.TEST.EXPECTED_RESULTS = []
    assert verify_results(cfg, results)


def test_visualize_dataset(tmp_path):
    import os as _os

    from PIL import Image
    from sos_wsod_tpu.tools.visualize import visualize_dataset

    imgdir = tmp_path / "im"
    _os.makedirs(imgdir)
    fp = str(imgdir / "a.jpg")
    Image.new("RGB", (60, 40)).save(fp)
    dicts = [{
        "file_name": fp,
        "annotations": [{"bbox": [5, 5, 30, 30], "category_id": 0}],
        "proposal_boxes": np.array([[1, 1, 10, 10], [2, 2, 12, 12]]),
    }]
    n = visualize_dataset(dicts, str(tmp_path / "out"), ["cat"],
                          draw_proposals=1)
    assert n == 1 and _os.path.exists(tmp_path / "out" / "a.jpg")


def test_filter_metrics():
    import json

    from sos_wsod_tpu.tools.filter_metrics import filter_metrics

    lines = [json.dumps({"iteration": i, "total_loss": i * 0.1,
                         "lr": 0.01, "data_time": 0.2}) for i in range(10)]
    out = filter_metrics(lines, keys=["total_loss"], every=2)
    assert [r["iteration"] for r in out] == [0, 2, 4, 6, 8]
    assert set(out[0]) == {"iteration", "total_loss"}
    assert len(filter_metrics(lines)) == 10


def test_builtin_extra_registrations():
    from sos_wsod_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from sos_wsod_tpu.data.datasets.builtin_extra import register_all_extra

    register_all_extra()
    expected = [
        "flickr_voc", "flickr_coco", "voc_2007_train_pgt", "voc_2007_val_pgt",
        "voc_2012_train_instance", "voc_2012_val_instance", "sbd_9118_instance",
        "voc_2012_train_instance_pgt", "sbd_9118_instance_pgt",
    ]
    for name in expected:
        assert name in DatasetCatalog, name
    assert len(MetadataCatalog.get("flickr_voc").thing_classes) == 20
    assert len(MetadataCatalog.get("flickr_coco").thing_classes) == 80
    assert len(MetadataCatalog.get("sbd_9118_instance").thing_classes) == 20
    # idempotent re-registration
    register_all_extra()
