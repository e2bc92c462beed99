#!/usr/bin/env python
"""Test-time-augmentation evaluation CLI.

Parity target: unbias/train_net_test_tta.py (stock d2 GeneralizedRCNNWithTTA
over a stage-2/3 model, multi-scale TEST.AUG.MIN_SIZES + flip) and the WSL TTA
wrappers GeneralizedRCNNWithTTAAVG / ...UNION
(uwsod/projects/WSL/wsl/modeling/test_time_augmentation_avg.py:29-427).

Strategy selection: --strategy avg|union (default: avg for the WSL
meta-architectures — the reference's released WSOD TTA recipe — and union for
the Faster R-CNN stack, matching the stock d2 TTA ensembling role).
Evaluates cfg.DATASETS.TEST with TEST.AUG.{MIN_SIZES,MAX_SIZE,FLIP}.
"""
from __future__ import annotations

import logging
import os
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.config import get_default_cfg  # noqa: E402
from sos_wsod_tpu.engine.defaults import (  # noqa: E402
    default_argument_parser,
    default_setup,
)

logger = logging.getLogger("sos_wsod_tpu.tta")

WSL_ARCHS = ("MultiInputRCNN", "GeneralizedRCNNWSL")


def setup(args):
    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def _load_params(cfg, args):
    from sos_wsod_tpu.engine.checkpoint import Checkpointer

    ckptr = Checkpointer(cfg.OUTPUT_DIR)
    state = ckptr.load(args.ckpt or ckptr.get_last_checkpoint() or "model_final")
    if cfg.SEMISUPNET.EVAL_TEACHER and "teacher_params" in state:
        return state["teacher_params"]
    return state.get("params", state)


def _test_dataset_dicts(cfg, name):
    from sos_wsod_tpu.data.build import get_detection_dataset_dicts
    from sos_wsod_tpu.data.datasets.voc import register_all_voc

    register_all_voc()
    proposal_files = None
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST:
        idx = list(cfg.DATASETS.TEST).index(name)
        proposal_files = [cfg.DATASETS.PROPOSAL_FILES_TEST[idx]]
    return get_detection_dataset_dicts(
        [name], filter_empty=False, proposal_files=proposal_files
    )


def eval_wsl_tta(cfg, args):
    """WSL models: average (or union) raw per-proposal scores over views."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sos_wsod_tpu.data.mapper_multi import read_image_bgr
    from sos_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN
    from sos_wsod_tpu.models.postprocess import fast_rcnn_inference_single
    from sos_wsod_tpu.models.tta import tta_avg_scores, tta_union_detections

    model = MultiInputRCNN.from_cfg(cfg)
    params = _load_params(cfg, args)

    @jax.jit
    def raw_predict(params, batch):
        _, all_scores, all_boxes = model.apply({"params": params}, batch, train=False)
        return all_scores, all_boxes

    @jax.jit
    def det_predict(params, batch):
        det, _, _ = model.apply({"params": params}, batch, train=False)
        return det.boxes, det.scores, det.classes, det.valid

    @jax.jit
    def final_inference(scores, boxes, valid, hw):
        return fast_rcnn_inference_single(
            boxes, scores, valid, hw,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            topk=cfg.TEST.DETECTIONS_PER_IMAGE,
        )

    results = OrderedDict()
    kw = dict(
        min_sizes=cfg.TEST.AUG.MIN_SIZES,
        max_size=cfg.TEST.AUG.MAX_SIZE,
        flip=cfg.TEST.AUG.FLIP,
        capacity=cfg.TPU.PROPOSAL_CAPACITY,
        size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
    )
    for name in cfg.DATASETS.TEST:
        dicts = _test_dataset_dicts(cfg, name)
        evaluator = PascalVOCDetectionEvaluator(name)
        evaluator.reset()
        for i, d in enumerate(dicts):
            image = read_image_bgr(d["file_name"])
            raw_boxes = np.asarray(d.get("proposal_boxes", np.zeros((1, 4))), np.float32)
            raw_logits = np.asarray(
                d.get("proposal_objectness_logits", np.zeros(1)), np.float32
            )
            hw = np.array([d["height"], d["width"]], np.float32)
            if args.strategy == "avg":
                scores, boxes, valid = tta_avg_scores(
                    lambda b: raw_predict(params, jax.tree_util.tree_map(jnp.asarray, b)),
                    image, raw_boxes, raw_logits, **kw,
                )
                det = jax.device_get(final_inference(
                    jnp.asarray(scores, jnp.float32), jnp.asarray(boxes, jnp.float32),
                    jnp.asarray(valid), jnp.asarray(hw)))
                evaluator.process_single(
                    d["image_id"], det.boxes, det.scores, det.classes, det.valid)
            else:
                boxes, scores, classes = tta_union_detections(
                    lambda b: det_predict(params, jax.tree_util.tree_map(jnp.asarray, b)),
                    image, raw_boxes, raw_logits,
                    nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                    topk=cfg.TEST.DETECTIONS_PER_IMAGE, **kw,
                )
                evaluator.process_single(
                    d["image_id"], boxes, scores, classes,
                    np.ones(len(scores), bool))
            if (i + 1) % 200 == 0:
                logger.info("TTA inference %d/%d images", i + 1, len(dicts))
        results[name] = evaluator.evaluate()
        logger.info("TTA results for %s: %s", name, dict(results[name]))
    return results


def eval_frcnn_tta(cfg, args):
    """Stage-2/3 Faster R-CNN: union of per-view detections + one NMS."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sos_wsod_tpu.data.mapper_multi import read_image_bgr
    from sos_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator
    from sos_wsod_tpu.models.meta.rcnn import GeneralizedRCNN
    from sos_wsod_tpu.models.tta import tta_union_detections

    model = GeneralizedRCNN.from_cfg(cfg)
    params = _load_params(cfg, args)

    @jax.jit
    def infer(params, batch):
        det, _, _ = model.apply({"params": params}, batch, branch="inference")
        return det.boxes, det.scores, det.classes, det.valid

    def infer_fn(batch):
        batch = dict(batch)
        for k in ("boxes", "objectness", "prop_valid", "valid_hw"):
            batch.pop(k, None)
        return infer(params, jax.tree_util.tree_map(jnp.asarray, batch))

    results = OrderedDict()
    for name in cfg.DATASETS.TEST:
        dicts = _test_dataset_dicts(cfg, name)
        evaluator = PascalVOCDetectionEvaluator(name)
        evaluator.reset()
        for i, d in enumerate(dicts):
            image = read_image_bgr(d["file_name"])
            boxes, scores, classes = tta_union_detections(
                infer_fn, image, np.zeros((1, 4), np.float32), np.zeros(1, np.float32),
                min_sizes=cfg.TEST.AUG.MIN_SIZES,
                max_size=cfg.TEST.AUG.MAX_SIZE,
                flip=cfg.TEST.AUG.FLIP,
                capacity=1,
                size_divisibility=cfg.TPU.IMAGE_SIZE_DIVISIBILITY,
                nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                topk=cfg.TEST.DETECTIONS_PER_IMAGE,
            )
            evaluator.process_single(
                d["image_id"], boxes, scores, classes, np.ones(len(scores), bool))
            if (i + 1) % 200 == 0:
                logger.info("TTA inference %d/%d images", i + 1, len(dicts))
        results[name] = evaluator.evaluate()
        logger.info("TTA results for %s: %s", name, dict(results[name]))
    return results


def main(args):
    cfg = setup(args)
    is_wsl = cfg.MODEL.META_ARCHITECTURE in WSL_ARCHS
    if args.strategy == "auto":
        args.strategy = "avg" if is_wsl else "union"
    results = eval_wsl_tta(cfg, args) if is_wsl else eval_frcnn_tta(cfg, args)
    if cfg.TEST.EXPECTED_RESULTS:
        from sos_wsod_tpu.evaluation.testing import verify_results

        verify_results(cfg, results)
    return results


if __name__ == "__main__":
    parser = default_argument_parser()
    parser.add_argument("--strategy", default="auto", choices=("auto", "avg", "union"))
    parser.add_argument("--ckpt", default="")
    main(parser.parse_args())
