"""Default setup + inference runner + argument parser.

Parity targets: detectron2 engine/defaults.py (default_argument_parser,
default_setup, DefaultTrainer.test) and evaluator.inference_on_dataset
(detectron2/detectron2/evaluation/evaluator.py). The inference loop batches
compilation by padded-canvas bucket: each distinct (H, W, P) signature compiles
once, every following image at that signature reuses the executable.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from collections import OrderedDict
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)


def default_argument_parser(epilog: Optional[str] = None) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(epilog=epilog)
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=1, help="number of chips (mesh size)")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="Modify config options 'KEY VALUE' pairs at the end",
    )
    return parser


def setup_logging(output_dir: str = "", name: str = "sos_wsod_tpu"):
    fmt = "[%(asctime)s] %(name)s %(levelname)s: %(message)s"
    handlers = [logging.StreamHandler(sys.stdout)]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(output_dir, "log.txt")))
    logging.basicConfig(level=logging.INFO, format=fmt, handlers=handlers, force=True)


def maybe_init_distributed(args=None) -> int:
    """Multi-host bring-up — the TPU-native analog of the reference's
    launch() -> dist.init_process_group(backend="NCCL")
    (detectron2/detectron2/engine/launch.py:27-123).

    Initializes ``jax.distributed`` when either
      (a) the reference-style CLI args request multiple machines
          (``--num-machines N --machine-rank R --dist-url tcp://host:port``;
          the coordinator is machine-rank 0 at the dist-url address), or
      (b) the standard JAX cluster env vars are present
          (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` +
          ``JAX_PROCESS_ID``], or a recognized cluster environment).
    No-op when already initialized or single-process. After this, the data
    loaders rank-stride their index streams (data/build.py) and the trainers
    assemble global batches from per-process shards, so no further plumbing
    is required. Returns the process count.
    """
    import jax

    if jax.distributed.is_initialized():
        return jax.process_count()
    if args is not None and getattr(args, "num_machines", 1) > 1:
        url = getattr(args, "dist_url", "auto") or "auto"
        if url == "auto":
            raise ValueError(
                "--num-machines > 1 requires --dist-url tcp://host:port "
                "(the reference's launch.py:38 contract)")
        addr = url.split("://")[-1]
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=args.num_machines,
            process_id=getattr(args, "machine_rank", 0),
        )
        return jax.process_count()
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()  # everything from the env / cluster
        return jax.process_count()
    return 1


def default_setup(cfg, args):
    maybe_init_distributed(args)
    setup_logging(cfg.OUTPUT_DIR)
    logger.info("Command line args: %s", args)
    if cfg.OUTPUT_DIR:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    seed = cfg.SEED
    if seed >= 0:
        np.random.seed(seed)


def auto_scale_workers(cfg, num_workers: int):
    """Rescale LR / WSL.ITER_SIZE when running on fewer chips than the recipe.

    Parity target: the WSL trainer's ``auto_scale_workers``
    (uwsod/projects/WSL/tools/train_net.py:309-328): when
    SOLVER.REFERENCE_WORLD_SIZE is set and the actual world size is SMALLER,
    divide BASE_LR by the scale and ceil-multiply WSL.ITER_SIZE so the
    effective batch per optimizer step is preserved via gradient accumulation.
    Larger-than-reference worlds are left unchanged, like the reference.
    """
    import math

    old_world_size = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old_world_size in (0, num_workers) or old_world_size < num_workers:
        return cfg
    frozen = cfg.is_frozen()  # our clone() does not preserve frozen state
    cfg = cfg.clone()
    cfg.defrost()
    scale = num_workers / old_world_size
    lr = cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR / scale
    iter_size = cfg.WSL.ITER_SIZE = math.ceil(cfg.WSL.ITER_SIZE / scale)
    logger.info("Auto-scaling the config to iter_size=%s, learning_rate=%s", iter_size, lr)
    if frozen:
        cfg.freeze()
    return cfg


def run_stage1_inference(model, params, data_iter: Iterable, evaluator) -> OrderedDict:
    """Drive single-image OICR+ inference over a test stream into an evaluator.

    Compiles one executable per padded-shape signature (jax.jit cache) and
    rescales detections to the original image size before handing them to the
    evaluator, mirroring inference_on_dataset + detector_postprocess.
    """
    import jax
    import jax.numpy as jnp

    from ..models.postprocess import rescale_detections

    @jax.jit
    def infer(params, batch):
        det, all_scores, all_boxes = model.apply({"params": params}, batch, train=False)
        det = rescale_detections(det, batch["image_hw"], batch["orig_hw"])
        return det

    evaluator.reset()
    n = 0
    t0 = time.perf_counter()
    for sample in data_iter:
        image_id = sample.pop("image_id")
        orig_hw = sample["orig_hw"]
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        det = jax.device_get(infer(params, batch))
        evaluator.process_single(
            image_id, det.boxes, det.scores, det.classes, det.valid
        )
        n += 1
        if n % 500 == 0:
            logger.info("Inference %d images (%.3f s/img)", n, (time.perf_counter() - t0) / n)
    results = evaluator.evaluate()
    logger.info("Evaluation results: %s", dict(results))
    return results
