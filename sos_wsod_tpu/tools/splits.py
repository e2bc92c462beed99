"""Dataset split tools for stage 3 (clean/noisy division by per-image loss).

Parity targets:
 - unbias/generate_base_split.py:24-49 — dataseed with len-1 labeled indices
   and the bisected percent string;
 - unbias/split_single.py:29-119 — per-image loss
   (loss_cls + loss_box_reg + loss_rpn_cls + loss_rpn_loc) of the stage-2
   student, ascending sort, top-k indices as the "clean" half, percent
   bisection to 7 decimals, dataseed JSON {percent: {"1": [idx...]}};
 - unbias/split_multi.py:45-160 — the data-parallel variant (rank r scores
   image (base + r) % N with all_gather per step). Here the device mesh
   replaces process ranks: images are scored in device-parallel chunks via the
   same jitted loss program; the host keeps the id->loss table.

The reference's bisection has an off-by-variable bug (`begin = middle` instead
of `low = middle`, split_single.py:107) that never fires for the k it is run
with; we implement the fixed loop, which yields identical output whenever the
reference's terminates.
"""
from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def bisect_percent_for_k(length: int, k: int) -> float:
    """Find percent (middle*100, middle rounded to 7 decimals) such that
    int(length * middle) == k (split_single.py:94-109)."""
    low = k / length
    high = (k + 1) / length
    while True:
        middle = round((low + high) / 2, 7)
        val = int(length * middle)
        if val == k:
            return middle * 100
        elif val > k:
            high = middle
        else:
            low = middle


def bisect_percent_direct(length: int, target: int) -> float:
    """generate_base_split variant: percent in [0, 100] with
    int(percent/100*length) == target (generate_base_split.py:35-45)."""
    low, high = 0.0, 100.0
    while True:
        middle = round((low + high) / 2, 7)
        val = int(middle / 100 * length)
        if val == target:
            return middle
        elif val < target:
            low = middle
        else:
            high = middle


def generate_base_split(dataset_len: int) -> Dict:
    """Dataseed marking all-but-one images as labeled."""
    target = dataset_len - 1
    percent = bisect_percent_direct(dataset_len, target)
    return {str(percent): {"1": list(range(target))}}


def split_by_losses(
    image_ids: Sequence[int], losses: Sequence[float], k: int
) -> Tuple[Dict, float]:
    """Sort ascending by loss, map the k lowest-loss image ids back to dataset
    positions (VOC order == scoring order), bisect the percent."""
    losses = np.asarray(losses, np.float32)
    order = np.argsort(losses, kind="stable")
    imgid2pos = {int(image_ids[i]): i for i in range(len(image_ids))}
    clean_positions = [imgid2pos[int(image_ids[i])] for i in order]
    length = len(image_ids)
    percent = bisect_percent_for_k(length, k)
    return {str(percent): {"1": clean_positions[:k]}}, percent


def score_dataset_losses(
    model,
    params,
    samples,
    loss_keys: Sequence[str] = ("loss_cls", "loss_box_reg", "loss_rpn_cls", "loss_rpn_loc"),
    rng=None,
) -> Tuple[List[int], List[float]]:
    """Per-image 4-term training loss under fixed params (no grad), jitted once
    per canvas bucket. ``samples`` yields mapped dicts with image_id."""
    import jax
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def loss_one(params, batch, key):
        losses = model.apply({"params": params}, batch, key, branch="supervised")
        return sum(jnp.asarray(losses[k], jnp.float32) for k in loss_keys)

    ids, losses = [], []
    for i, sample in enumerate(samples):
        image_id = sample.pop("image_id")
        sample.pop("orig_hw", None)
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        key = jax.random.fold_in(rng, i)
        ids.append(int(image_id))
        losses.append(float(loss_one(params, batch, key)))
    return ids, losses


def main(argv=None):
    import argparse

    import jax

    parser = argparse.ArgumentParser("Perform dataset split.")
    parser.add_argument("--config", default="configs/split/voc_split.yaml")
    parser.add_argument("--ckpt", default="output/voc_baseline/model_final")
    parser.add_argument("--save-path", default="dataseed/VOC07_oicr_plus_split.txt")
    parser.add_argument("--k", default=2000, type=int)
    parser.add_argument("--base-only", action="store_true",
                        help="generate_base_split mode (no model scoring)")
    args = parser.parse_args(argv)

    from ..config import get_default_cfg
    from ..data.build import get_detection_dataset_dicts
    from ..data.datasets.voc import register_all_voc

    from ..engine.defaults import maybe_init_distributed

    world = maybe_init_distributed()  # env-gated (JAX_COORDINATOR_ADDRESS)
    rank = jax.process_index()

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config)
    register_all_voc()
    dataset_dicts = get_detection_dataset_dicts(cfg.DATASETS.TRAIN, filter_empty=False)

    if args.base_only:
        split = generate_base_split(len(dataset_dicts))
    else:
        from ..data.mapper_twocrop import DatasetMapperTwoCropSeparate
        from ..engine.checkpoint import Checkpointer
        from ..models.meta.rcnn import GeneralizedRCNN

        model = GeneralizedRCNN.from_cfg(cfg)
        state = Checkpointer("").load(args.ckpt)
        params = state.get("params", state)
        # weak-view mapper at a fixed scale for deterministic scoring
        mapper = DatasetMapperTwoCropSeparate(
            min_size_train=[cfg.INPUT.MIN_SIZE_TEST],
            max_size_train=cfg.INPUT.MAX_SIZE_TEST,
            random_flip=False,
            gt_capacity=cfg.TPU.PGT_CAPACITY,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
        )

        # multi-host: process r scores the rank-interleaved image subset,
        # like split_multi's rank r -> image (base + r) % N
        # (unbias/split_multi.py:95-100); the (id, loss) pairs are
        # allgathered and deduped before the sort, like its
        # all_gather_object + rank-0 dedup
        my_dicts = dataset_dicts[rank::world] if world > 1 else dataset_dicts

        def samples():
            for d in my_dicts:
                pair = mapper(d)
                if pair is not None:
                    yield pair[1]  # weak view

        ids, losses = score_dataset_losses(model, params, samples())
        if world > 1:
            from ..parallel.mesh import process_gather

            pairs = process_gather(list(zip(ids, losses)))
            seen = {}
            for i, l in pairs:
                seen.setdefault(int(i), float(l))
            ids, losses = list(seen.keys()), list(seen.values())
        split, percent = split_by_losses(ids, losses, args.k)
        print(f"The finded percent is: {percent}")

    if rank == 0:
        with open(args.save_path, "w") as f:
            json.dump(split, f)


if __name__ == "__main__":
    main()
