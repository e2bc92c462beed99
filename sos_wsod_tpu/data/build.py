"""Data loader assembly: dataset dicts -> mapped, bucketed, batched streams.

Parity targets: detectron2 build.py (reference: uwsod/detectron2/data/build.py —
get_detection_dataset_dicts, proposal merging :102-160, TrainingSampler infinite
shuffled stream, aspect-ratio grouping) re-expressed for a host->TPU pipeline:
instead of per-rank PyTorch DataLoaders feeding variable-shape tensors, each
host maps images to fixed-capacity padded samples and groups them into global
batches whose canvases share one bucketed shape (jit-cache friendly).
"""
from __future__ import annotations

import itertools
import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .catalog import DatasetCatalog
from .mapper_multi import bucket_shape, pad_image
from .proposals import load_proposals_into_dataset

logger = logging.getLogger(__name__)


def get_detection_dataset_dicts(
    names: Sequence[str],
    filter_empty: bool = True,
    proposal_files: Optional[Sequence[str]] = None,
) -> List[dict]:
    if isinstance(names, str):
        names = [names]
    dicts_per = [DatasetCatalog.get(n) for n in names]
    if proposal_files:
        assert len(proposal_files) == len(names)
        dicts_per = [
            load_proposals_into_dataset(d, f) for d, f in zip(dicts_per, proposal_files)
        ]
    dataset_dicts = list(itertools.chain.from_iterable(dicts_per))
    if filter_empty and all("annotations" in d for d in dataset_dicts):
        before = len(dataset_dicts)
        dataset_dicts = [d for d in dataset_dicts if len(d.get("annotations", []))]
        logger.info("Removed %d images with no annotations", before - len(dataset_dicts))
    return dataset_dicts


def _process_shard(process_index: Optional[int],
                   process_count: Optional[int]):
    """Resolve (rank, world) for host-side stream sharding; defaults come
    from the jax runtime so multi-host training needs no plumbing beyond
    jax.distributed.initialize (engine/defaults.py:maybe_init_distributed)."""
    if process_index is None or process_count is None:
        import jax

        if process_index is None:
            process_index = jax.process_index()
        if process_count is None:
            process_count = jax.process_count()
    assert 0 <= process_index < process_count
    return process_index, process_count


def training_index_stream(
    n: int,
    seed: int = 0,
    shuffle: bool = True,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Iterator[int]:
    """Infinite shuffled index stream (d2 TrainingSampler semantics).

    Multi-host: every process draws the SAME seeded stream and keeps its
    rank-strided slice — exactly d2's TrainingSampler, whose __iter__ is
    islice(self._infinite_indices(), rank, None, world_size)
    (detectron2/detectron2/data/samplers/distributed_sampler.py) — so hosts
    consume disjoint indices whose union is the single-host stream."""
    rank, world = _process_shard(process_index, process_count)

    def gen():
        rng = np.random.RandomState(seed)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            yield from order.tolist()

    if world > 1:
        return itertools.islice(gen(), rank, None, world)
    return gen()


def _repad_to(sample: Dict[str, np.ndarray], shapes: Dict[str, tuple]) -> Dict[str, np.ndarray]:
    """Grow a mapped sample's image canvases to the per-key (bh, bw)."""
    out = dict(sample)
    for key in ("images_s1", "images_s2"):
        if key in out and key in shapes:
            bh, bw = shapes[key]
            imgs = out[key]
            if imgs.shape[1] != bh or imgs.shape[2] != bw:
                out[key] = np.stack([pad_image(im, bh, bw) for im in imgs])
    if "image" in out and "image" in shapes:
        bh, bw = shapes["image"]
        if out["image"].shape[0] != bh or out["image"].shape[1] != bw:
            out["image"] = pad_image(out["image"], bh, bw)
    return out


def batched_stream(
    dataset_dicts: List[dict],
    mapper: Callable[[dict], Optional[Dict[str, np.ndarray]]],
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    size_divisibility: int = 64,
    num_workers: int = 0,
    aspect_ratio_grouping: bool = True,
) -> Iterator[List[Dict[str, np.ndarray]]]:
    """Yield lists of ``batch_size`` mapped samples sharing one canvas shape.

    Mapped samples are binned by aspect (tall vs wide, the d2 2-bucket scheme)
    so the shared canvas wastes little; each emitted batch is re-padded to the
    max bucketed (H, W) over its members. mapper returning None skips the image
    (empty proposals / labels), like the reference trainer's empty-batch skip.
    """
    stream = training_index_stream(len(dataset_dicts), seed, shuffle)

    def mapped():
        if num_workers > 0:
            ex = ThreadPoolExecutor(num_workers)
            window = 2 * max(num_workers, batch_size)
            futs = []
            it = iter(stream)
            for _ in range(window):
                futs.append(ex.submit(mapper, dataset_dicts[next(it)]))
            while True:
                fut = futs.pop(0)
                futs.append(ex.submit(mapper, dataset_dicts[next(it)]))
                s = fut.result()
                if s is not None:
                    yield s
        else:
            for i in stream:
                s = mapper(dataset_dicts[i])
                if s is not None:
                    yield s

    buckets: Dict[tuple, List[Dict[str, np.ndarray]]] = {}
    for s in mapped():
        img = s.get("images_s1", s.get("image"))
        h, w = (img.shape[1], img.shape[2]) if img.ndim == 4 else img.shape[:2]
        # group by aspect AND proposal bucket: with TPU.PROPOSAL_BUCKETS the
        # proposal axis varies per image, and a batch must be stackable
        pcap = s["prop_valid"].shape[-1] if "prop_valid" in s else 0
        b = (int(h > w) if aspect_ratio_grouping else 0, pcap)
        buckets.setdefault(b, []).append(s)
        if len(buckets[b]) == batch_size:
            group = buckets[b]
            buckets[b] = []
            # per-key canvases: scale-1 and scale-2 pad independently so the
            # smaller scale doesn't inherit the big scale's conv cost
            shapes: Dict[str, tuple] = {}
            for key in ("images_s1", "images_s2", "image"):
                bh = bw = 0
                for g in group:
                    if key not in g:
                        continue
                    im = g[key]
                    gh, gw = (im.shape[1], im.shape[2]) if im.ndim == 4 else im.shape[:2]
                    bh, bw = max(bh, gh), max(bw, gw)
                if bh:
                    shapes[key] = bucket_shape(bh, bw, size_divisibility)
            yield [_repad_to(g, shapes) for g in group]


def build_stage1_train_loader(cfg, mapper=None, batch_size: Optional[int] = None):
    """Infinite stream of stage-1 multi-view batches (global batch size =
    SOLVER.IMS_PER_BATCH unless overridden). Single-view WSL
    meta-architectures (GeneralizedRCNNWSL, reference train_net.py) get the
    stock one-view mapper instead of the 4-view multi-input one."""
    from .mapper_multi import DatasetMapperMultiInput, DatasetMapperSingle

    dataset_dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        proposal_files=cfg.DATASETS.PROPOSAL_FILES_TRAIN if cfg.MODEL.LOAD_PROPOSALS else None,
    )
    if mapper is None and cfg.MODEL.META_ARCHITECTURE != "MultiInputRCNN":
        mapper = DatasetMapperSingle(
            min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_type=cfg.INPUT.CROP.TYPE,
            crop_size=cfg.INPUT.CROP.SIZE,
            random_flip=cfg.INPUT.RANDOM_FLIP != "none",
            proposal_topk=cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN,
            proposal_capacity=cfg.TPU.PROPOSAL_CAPACITY,
            proposal_buckets=tuple(getattr(cfg.TPU, "PROPOSAL_BUCKETS", ()) or ()),
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
            seed=max(cfg.SEED, 0),
        )
    if mapper is None:
        mapper = DatasetMapperMultiInput(
            min_size_train=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
            crop_enabled=cfg.INPUT.CROP.ENABLED,
            crop_type=cfg.INPUT.CROP.TYPE,
            crop_size=cfg.INPUT.CROP.SIZE,
            proposal_topk=cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN,
            proposal_capacity=cfg.TPU.PROPOSAL_CAPACITY,
            proposal_buckets=tuple(getattr(cfg.TPU, "PROPOSAL_BUCKETS", ()) or ()),
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
            seed=max(cfg.SEED, 0),
        )
    # SOLVER.IMS_PER_BATCH is GLOBAL (like d2); each host maps its own
    # 1/process_count share and the trainer assembles the global batch from
    # process-local shards (engine/trainer.py _place via
    # make_array_from_process_local_data)
    global_bs = batch_size or cfg.SOLVER.IMS_PER_BATCH
    _, world = _process_shard(None, None)
    assert global_bs % world == 0, (
        f"IMS_PER_BATCH={global_bs} not divisible by {world} processes")
    return batched_stream(
        dataset_dicts,
        mapper,
        global_bs // world,
        seed=max(cfg.SEED, 0),
        size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        aspect_ratio_grouping=cfg.DATALOADER.ASPECT_RATIO_GROUPING,
    )


class DatasetMapperTest:
    """Single-view inference mapper: ResizeShortestEdge(MIN_SIZE_TEST), no flip,
    proposals transformed + padded (reference DatasetMapper train=False path)."""

    def __init__(
        self,
        *,
        min_size_test: int,
        max_size_test: int,
        proposal_topk: int = 1000,
        proposal_capacity: int = 4096,
        proposal_buckets: Sequence[int] = (),
        size_divisibility: int = 64,
    ):
        self.min_size_test = min_size_test
        self.max_size_test = max_size_test
        self.proposal_topk = proposal_topk
        self.capacity = proposal_capacity
        self.proposal_buckets = tuple(sorted(int(b) for b in proposal_buckets))
        self.size_divisibility = size_divisibility

    def __call__(self, d: dict) -> Dict[str, np.ndarray]:
        from . import transforms as T
        from .mapper_multi import read_image_bgr

        image = d.get("image")
        if image is None:
            image = read_image_bgr(d["file_name"])
        h, w = image.shape[:2]
        t = T.resize_shortest_edge(h, w, [self.min_size_test], self.max_size_test, None)
        img = t.apply_image(image)
        ih, iw = img.shape[:2]
        bh, bw = bucket_shape(ih, iw, self.size_divisibility)

        cap = self.capacity
        if "proposal_boxes" in d:
            # Mirror detection_utils.transform_proposals: transform ALL
            # proposals, clip, filter nonempty (and dedup like the train
            # mapper), THEN take topk — truncating first would let
            # degenerate/duplicate boxes crowd out valid ones.
            from ..core.boxes import unique_boxes_keep_mask
            from .mapper_multi import DatasetMapperMultiInput, _nonempty_np

            raw = np.asarray(d["proposal_boxes"], np.float32)
            logits = np.asarray(d["proposal_objectness_logits"], np.float32)[: raw.shape[0]]
            b = t.apply_box(raw)
            b = T.clip_boxes_np(b, (ih, iw))
            keep = unique_boxes_keep_mask(b) & _nonempty_np(b)
            b = b[keep][: self.proposal_topk]
            logits = logits[keep][: self.proposal_topk]
            cap = DatasetMapperMultiInput.pick_capacity(
                b.shape[0], self.proposal_buckets, self.capacity)
            n = min(b.shape[0], cap)
            out_boxes = np.zeros((cap, 4), np.float32)
            objectness = np.zeros((cap,), np.float32)
            valid = np.zeros((cap,), bool)
            out_boxes[:n] = b[:n]
            objectness[:n] = logits[:n]
            valid[:n] = True
        else:
            out_boxes = np.zeros((cap, 4), np.float32)
            objectness = np.zeros((cap,), np.float32)
            valid = np.zeros((cap,), bool)
        return {
            "image": pad_image(img.astype(np.float32), bh, bw),
            "valid_hw": np.array([ih, iw], np.int32),
            "boxes": out_boxes,
            "objectness": objectness,
            "prop_valid": valid,
            "image_hw": np.array([ih, iw], np.float32),
            "image_id": d.get("image_id"),
            "orig_hw": np.array([h, w], np.float32),
        }


def build_stage1_test_loader(cfg, dataset_name: str, mapper=None):
    """Finite per-image stream for evaluation (one sample per yield)."""
    idx = (
        list(cfg.DATASETS.TEST).index(dataset_name)
        if dataset_name in cfg.DATASETS.TEST
        else None
    )
    proposal_files = None
    if cfg.MODEL.LOAD_PROPOSALS and idx is not None and cfg.DATASETS.PROPOSAL_FILES_TEST:
        proposal_files = [cfg.DATASETS.PROPOSAL_FILES_TEST[idx]]
    dataset_dicts = get_detection_dataset_dicts(
        [dataset_name], filter_empty=False, proposal_files=proposal_files
    )
    if mapper is None:
        mapper = DatasetMapperTest(
            min_size_test=cfg.INPUT.MIN_SIZE_TEST,
            max_size_test=cfg.INPUT.MAX_SIZE_TEST,
            proposal_topk=cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST,
            proposal_capacity=cfg.TPU.PROPOSAL_CAPACITY,
            proposal_buckets=tuple(getattr(cfg.TPU, "PROPOSAL_BUCKETS", ()) or ()),
            size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
        )
    for d in dataset_dicts:
        yield mapper(d)
