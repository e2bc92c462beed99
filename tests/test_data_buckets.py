"""Proposal-capacity bucketing (TPU.PROPOSAL_BUCKETS).

The reference processes each image's true selective-search proposal count
dynamically (capped at DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN=4000,
uwsod/projects/WSL/configs/Detection/Base-RCNN-DilatedC5.yaml:5); our static
shapes pad instead, and buckets keep that padding near the true count rather
than worst-case for every image.
"""
import numpy as np

from sos_wsod_tpu.data.build import batched_stream
from sos_wsod_tpu.data.mapper_multi import DatasetMapperMultiInput


def _dicts(counts, h=96, w=128, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for i, n in enumerate(counts):
        x1 = rng.uniform(0, w - 12, n)
        y1 = rng.uniform(0, h - 12, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(4, 30, n), y1 + rng.uniform(4, 30, n)], 1
        ).astype(np.float32)
        out.append({
            "image": rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
            "image_id": i,
            "width": w,
            "height": h,
            "proposal_boxes": boxes,
            "proposal_objectness_logits": rng.rand(n).astype(np.float32),
            "annotations": [{"category_id": i % 3, "bbox": [1, 1, 10, 10],
                             "bbox_mode": 0}],
        })
    return out


def _mapper(buckets, capacity=512):
    return DatasetMapperMultiInput(
        min_size_train=[64], max_size_train=192, crop_enabled=False,
        proposal_topk=0, proposal_capacity=capacity,
        proposal_buckets=buckets, num_classes=3, size_divisibility=32,
        seed=0)


def test_pick_capacity():
    pick = DatasetMapperMultiInput.pick_capacity
    assert pick(10, (64, 128, 512), 512) == 64
    assert pick(64, (64, 128, 512), 512) == 64
    assert pick(65, (64, 128, 512), 512) == 128
    assert pick(9999, (64, 128, 512), 512) == 512  # overflow -> largest
    assert pick(10, (), 512) == 512                # no buckets -> capacity


def test_mapper_pads_to_smallest_bucket():
    m = _mapper((64, 128, 512))
    small, big = _dicts([40, 300])
    s = m(small)
    b = m(big)
    # dedup can only shrink counts, so the bucket is at most the raw one
    assert s["prop_valid"].shape[0] == 64
    assert s["boxes"].shape == (4, 64, 4)
    assert b["prop_valid"].shape[0] in (256, 512) or b["prop_valid"].shape[0] == 512
    assert b["prop_valid"].shape[0] == 512 or b["prop_valid"].sum() <= 128
    # valid slots hold the kept proposals, the rest are padding
    assert 0 < s["prop_valid"].sum() <= 40


def test_batched_stream_groups_same_bucket():
    m = _mapper((64, 512))
    dicts = _dicts([30, 400, 25, 350, 20, 380, 28, 390])
    stream = batched_stream(dicts, m, 2, seed=0, size_divisibility=32)
    for _ in range(6):
        group = next(stream)
        caps = {g["prop_valid"].shape[0] for g in group}
        assert len(caps) == 1, f"mixed proposal buckets in one batch: {caps}"
        canv = {g["images_s1"].shape[1:3] for g in group}
        assert len(canv) == 1
