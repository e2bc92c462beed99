#!/usr/bin/env python
"""Stage-1 WSOD training/eval CLI.

Parity target: the reference entry point uwsod/projects/WSL/tools/
train_net_multi.py (setup -> Trainer -> resume_or_load -> train; --eval-only
runs the evaluator over cfg.DATASETS.TEST, optionally dumping the
detection-result JSON that feeds stage 2).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sos_wsod_tpu.config import get_default_cfg  # noqa: E402
from sos_wsod_tpu.engine.defaults import (  # noqa: E402
    auto_scale_workers,
    default_argument_parser,
    default_setup,
    run_stage1_inference,
)


def setup(args):
    import jax

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()
    cfg = auto_scale_workers(cfg, len(jax.devices()))
    default_setup(cfg, args)
    return cfg


def do_test(cfg, model, params):
    from collections import OrderedDict

    from sos_wsod_tpu.data.build import build_stage1_test_loader
    from sos_wsod_tpu.data.datasets.builtin_extra import register_all_extra
    from sos_wsod_tpu.data.datasets.voc import register_all_voc
    from sos_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator

    register_all_voc()
    register_all_extra()
    results = OrderedDict()
    for name in cfg.DATASETS.TEST:
        loader = build_stage1_test_loader(cfg, name)
        evaluator = PascalVOCDetectionEvaluator(
            name,
            save_detection_result=cfg.WSODEVAL.SAVE_DETECTION_RESULT,
            save_path=cfg.WSODEVAL.SAVE_PATH or os.path.join(
                cfg.OUTPUT_DIR, "detection_results", "oicr_plus_{}.json"
            ),
        )
        results[name] = run_stage1_inference(model, params, loader, evaluator)
    if cfg.TEST.EXPECTED_RESULTS:
        from sos_wsod_tpu.evaluation.testing import verify_results

        verify_results(cfg, results)
    return results


def main(args):
    import jax

    from sos_wsod_tpu.data.build import build_stage1_train_loader
    from sos_wsod_tpu.data.datasets.builtin_extra import register_all_extra
    from sos_wsod_tpu.data.datasets.voc import register_all_voc
    from sos_wsod_tpu.engine.checkpoint import Checkpointer, PeriodicCheckpointer
    from sos_wsod_tpu.engine.hooks import (
        CheckpointHook,
        EvalHook,
        IterationTimer,
        LRSchedulerHook,
        PeriodicWriter,
    )
    from sos_wsod_tpu.engine.trainer import Stage1Trainer
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN
    from sos_wsod_tpu.parallel.mesh import make_mesh
    from sos_wsod_tpu.solver.build import warmup_multistep_lr
    from sos_wsod_tpu.utils.events import CommonMetricPrinter, JSONWriter

    cfg = setup(args)
    register_all_voc()
    register_all_extra()

    if cfg.MODEL.META_ARCHITECTURE == "MultiInputRCNN":
        model = MultiInputRCNN.from_cfg(cfg)
    else:
        # single-view WSL path (reference train_net.py): WSDDN / OICR / PCL /
        # CMIL / ContextLocNet / CSC / WSJDS heads via GeneralizedRCNNWSL
        from sos_wsod_tpu.models.meta.rcnn_wsl_single import GeneralizedRCNNWSL

        model = GeneralizedRCNNWSL.from_cfg(cfg)
    checkpointer = Checkpointer(cfg.OUTPUT_DIR)

    if args.eval_only:
        state = checkpointer.load(checkpointer.get_last_checkpoint() or "model_final")
        return do_test(cfg, model, state["params"])

    n_dev = len(jax.devices())
    cap = int(getattr(cfg.TPU, "MESH_DEVICES", 0))
    if cap > 0:
        n_dev = min(n_dev, cap)
    tp = max(1, int(getattr(cfg.TPU, "MODEL_AXIS_SIZE", 1)))
    mesh = (make_mesh(devices=jax.devices()[:n_dev], model_axis_size=tp)
            if n_dev > 1 else None)
    batch = cfg.SOLVER.IMS_PER_BATCH
    dp = n_dev // tp if mesh is not None else 1
    if mesh is not None and batch % dp != 0:
        raise ValueError(
            f"IMS_PER_BATCH {batch} not divisible by data-parallel size {dp}"
            f" ({n_dev} chips / MODEL_AXIS_SIZE {tp})")

    data_iter = build_stage1_train_loader(cfg)
    trainer = Stage1Trainer(cfg, model=model, data_iter=data_iter, mesh=mesh)

    schedule = warmup_multistep_lr(
        cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_METHOD,
    )
    pc = PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER)
    writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
               JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    trainer.register_hooks([
        IterationTimer(),
        LRSchedulerHook(schedule),
        CheckpointHook(pc),
        EvalHook(cfg.TEST.EVAL_PERIOD,
                 lambda: do_test(cfg, model, trainer.state["params"])),
        PeriodicWriter(writers, period=20),
    ])

    start_iter = 0
    if args.resume and checkpointer.has_checkpoint():
        # init from one batch to build the state skeleton, then restore into it
        first = next(data_iter)
        from sos_wsod_tpu.engine.trainer import stack_batch

        trainer.init_state(stack_batch(first))
        trainer.state = checkpointer.resume_or_load(trainer.state, resume=True)
        start_iter = int(trainer.state["iter"])
    trainer.train(start_iter, cfg.SOLVER.MAX_ITER)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
