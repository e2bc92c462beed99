"""Host input-pipeline throughput: mapper_multi images/sec (VERDICT r4 #8).

At the device-side target rate (>= 3-5 img/s/chip for the stage-1 step) the
HOST must decode + 4-view-transform images at least that fast or the chip
starves. This bench synthesizes VOC-sized JPEGs (~500x375) with ~2k random
proposals each, then drives the REAL loader path — ``batched_stream`` +
``DatasetMapperMultiInput`` (JPEG decode, random crop, two-scale resize,
flips, proposal transform + capacity padding) — at several NUM_WORKERS
settings and reports mapped images/sec.

The loader is a ThreadPoolExecutor (data/build.py:127-137): PIL decode and
numpy transforms release the GIL for their hot parts, so threads scale with
cores. Report includes the host's core count — this container has 1 vCPU,
production v5e hosts have >= 100; images/sec/core is the portable number.
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(tmpdir: str, n_images: int, n_props: int):
    from PIL import Image

    rng = np.random.RandomState(0)
    dicts = []
    os.makedirs(tmpdir, exist_ok=True)
    for i in range(n_images):
        h, w = (375, 500) if i % 2 == 0 else (500, 375)
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        path = os.path.join(tmpdir, f"im{i:04d}.jpg")
        Image.fromarray(arr).save(path, quality=85)
        x1 = rng.uniform(0, w - 10, n_props)
        y1 = rng.uniform(0, h - 10, n_props)
        boxes = np.stack([
            x1, y1,
            np.minimum(x1 + rng.uniform(4, w / 2, n_props), w),
            np.minimum(y1 + rng.uniform(4, h / 2, n_props), h)], 1)
        dicts.append({
            "file_name": path, "image_id": i, "height": h, "width": w,
            "proposal_boxes": boxes.astype(np.float32),
            "proposal_objectness_logits": rng.rand(n_props).astype(np.float32),
            "annotations": [
                {"category_id": int(rng.randint(20)), "bbox": [0, 0, 10, 10],
                 "bbox_mode": 0}],
        })
    return dicts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--props", type=int, default=2000)
    ap.add_argument("--measure", type=int, default=128,
                    help="mapped samples to time per worker setting")
    ap.add_argument("--workers", default="0,4,8,16")
    ap.add_argument("--tmp", default="/tmp/sos_input_bench")
    args = ap.parse_args()

    from sos_wsod_tpu.data.build import batched_stream
    from sos_wsod_tpu.data.mapper_multi import DatasetMapperMultiInput

    dicts = make_dataset(args.tmp, args.images, args.props)
    sizes = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)

    print(f"host cores: {os.cpu_count()}", flush=True)
    for nw in [int(x) for x in args.workers.split(",")]:
        mapper = DatasetMapperMultiInput(
            min_size_train=sizes, max_size_train=2000,
            proposal_topk=4000, proposal_capacity=4096, seed=7)
        stream = batched_stream(dicts, mapper, batch_size=1, seed=3,
                                num_workers=nw)
        for _ in range(8):  # warm caches / fill the worker window
            next(stream)
        t0 = time.perf_counter()
        for _ in range(args.measure):
            next(stream)
        dt = time.perf_counter() - t0
        rate = args.measure / dt
        print(f"workers={nw:2d}  {rate:7.2f} images/sec "
              f"({rate / max(os.cpu_count(), 1):.2f}/core)", flush=True)


if __name__ == "__main__":
    main()
