#!/usr/bin/env python
"""Stage-2/3 training/eval CLI (pseudo-FSOD baseline + SSOD Unbiased-Teacher).

Parity target: unbias/train_net.py — Trainer selection via SEMISUPNET.Trainer
("ubteacher" / "baseline"), --eval-only evaluates the teacher
(SEMISUPNET.EVAL_TEACHER) or student over cfg.DATASETS.TEST.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.config import get_default_cfg  # noqa: E402
from sos_wsod_tpu.engine.defaults import (  # noqa: E402
    default_argument_parser,
    default_setup,
)


def setup(args):
    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def do_test(cfg, model, params):
    from collections import OrderedDict

    import jax
    import jax.numpy as jnp

    from sos_wsod_tpu.data.build import build_stage1_test_loader
    from sos_wsod_tpu.data.datasets.builtin_extra import register_all_extra
    from sos_wsod_tpu.data.datasets.voc import register_all_voc
    from sos_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator
    from sos_wsod_tpu.models.postprocess import rescale_detections

    register_all_voc()
    register_all_extra()
    results = OrderedDict()

    @jax.jit
    def infer(params, batch):
        det, _, _ = model.apply({"params": params}, batch, branch="inference")
        return rescale_detections(det, batch["image_hw"], batch["orig_hw"])

    for name in cfg.DATASETS.TEST:
        loader = build_stage1_test_loader(cfg, name)
        evaluator = PascalVOCDetectionEvaluator(name)
        evaluator.reset()
        for sample in loader:
            image_id = sample.pop("image_id")
            sample.pop("boxes", None)
            sample.pop("objectness", None)
            sample.pop("prop_valid", None)
            sample.pop("valid_hw", None)
            batch = {k: jnp.asarray(v) for k, v in sample.items()}
            det = jax.device_get(infer(params, batch))
            evaluator.process_single(image_id, det.boxes, det.scores, det.classes, det.valid)
        results[name] = evaluator.evaluate()
    if cfg.TEST.EXPECTED_RESULTS:
        from sos_wsod_tpu.evaluation.testing import verify_results

        verify_results(cfg, results)
    return results


def main(args):
    import jax

    from sos_wsod_tpu.data.datasets.builtin_extra import register_all_extra
    from sos_wsod_tpu.data.datasets.voc import register_all_voc
    from sos_wsod_tpu.data.mapper_twocrop import build_semisup_loader_from_cfg
    from sos_wsod_tpu.engine.checkpoint import Checkpointer, PeriodicCheckpointer
    from sos_wsod_tpu.engine.hooks import (
        CheckpointHook,
        EvalHook,
        IterationTimer,
        LRSchedulerHook,
        PeriodicWriter,
    )
    from sos_wsod_tpu.engine.ubteacher import BaselineTrainer, UBTeacherTrainer
    from sos_wsod_tpu.models.meta.rcnn import GeneralizedRCNN
    from sos_wsod_tpu.parallel.mesh import make_mesh
    from sos_wsod_tpu.solver.build import warmup_multistep_lr
    from sos_wsod_tpu.utils.events import CommonMetricPrinter, JSONWriter

    cfg = setup(args)
    register_all_voc()
    register_all_extra()

    model = GeneralizedRCNN.from_cfg(cfg)
    checkpointer = Checkpointer(cfg.OUTPUT_DIR)

    if args.eval_only:
        state = checkpointer.load(checkpointer.get_last_checkpoint() or "model_final")
        role = "teacher_params" if (
            cfg.SEMISUPNET.EVAL_TEACHER and "teacher_params" in state
        ) else "params"
        return do_test(cfg, model, state[role])

    n_dev = len(jax.devices())
    cap = int(getattr(cfg.TPU, "MESH_DEVICES", 0))
    if cap > 0:
        n_dev = min(n_dev, cap)
    mesh = make_mesh(devices=jax.devices()[:n_dev]) if n_dev > 1 else None
    data_iter = build_semisup_loader_from_cfg(cfg)

    if cfg.SEMISUPNET.Trainer == "ubteacher":
        trainer = UBTeacherTrainer(cfg, model=model, data_iter=data_iter, mesh=mesh)
    else:
        def labeled_only():
            for batch in data_iter:
                yield batch["label_k"]

        trainer = BaselineTrainer(cfg, model=model, data_iter=labeled_only(), mesh=mesh)

    schedule = warmup_multistep_lr(
        cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_METHOD,
    )
    pc = PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER)
    writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
               JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]

    def eval_fn():
        role = "teacher_params" if (
            cfg.SEMISUPNET.EVAL_TEACHER and "teacher_params" in trainer.state
        ) else "params"
        return do_test(cfg, model, trainer.state[role])

    trainer.register_hooks([
        IterationTimer(),
        LRSchedulerHook(schedule),
        CheckpointHook(pc),
        EvalHook(cfg.TEST.EVAL_PERIOD, eval_fn),
        PeriodicWriter(writers, period=20),
    ])

    start_iter = 0
    if args.resume and checkpointer.has_checkpoint():
        first = next(data_iter)
        from sos_wsod_tpu.engine.trainer import stack_batch

        trainer.init_state({k: stack_batch(v) for k, v in first.items()})
        trainer.state = checkpointer.resume_or_load(trainer.state, resume=True)
        start_iter = int(trainer.state["iter"])
    trainer.train(start_iter, cfg.SOLVER.MAX_ITER)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
