"""Trainer hook system.

Parity target: detectron2's HookBase/hook set
(reference: detectron2/detectron2/engine/train_loop.py + engine/hooks.py —
IterationTimer :77-147, PeriodicWriter, PeriodicCheckpointer wrapper, LRScheduler,
EvalHook, AutogradProfiler :271-334). The hook surface is preserved; the
profiler hook wraps ``jax.profiler`` traces instead of torch autograd.
"""
from __future__ import annotations

import logging
import time
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None  # set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class IterationTimer(HookBase):
    """Reports seconds/iter excluding the warmup iterations, and per-step
    time via EventStorage (reference hooks.py:77-147)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = 0.0
        self._total_timer_start = None
        self._step_start = 0.0
        self._done_iters = 0

    def before_train(self):
        self._start_time = time.perf_counter()

    def after_train(self):
        total = time.perf_counter() - self._start_time
        n = max(self._done_iters - self._warmup_iter, 1)
        logger.info("Total training time: %.1fs (%.4f s/iter over %d iters)", total, total / n, n)

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        dt = time.perf_counter() - self._step_start
        self._done_iters += 1
        if self._done_iters > self._warmup_iter:
            self.trainer.storage.put_scalar("time", dt, smoothing_hint=True)


class PeriodicWriter(HookBase):
    def __init__(self, writers: List, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period == 0 or (it == self.trainer.max_iter - 1):
            for w in self._writers:
                w.write(self.trainer.storage)

    def after_train(self):
        for w in self._writers:
            w.write(self.trainer.storage)
            w.close()


class CheckpointHook(HookBase):
    """Wraps engine.checkpoint.PeriodicCheckpointer over the trainer state."""

    def __init__(self, periodic_checkpointer):
        self._pc = periodic_checkpointer

    def after_step(self):
        self._pc.step(self.trainer.iter, self.trainer.state_dict())

    def after_train(self):
        # final save is handled by PeriodicCheckpointer.max_iter logic
        pass


class EvalHook(HookBase):
    def __init__(self, eval_period: int, eval_fn: Callable[[], Optional[dict]]):
        self._period = eval_period
        self._fn = eval_fn

    def _do_eval(self):
        results = self._fn()
        if results:
            flat = {}

            def _flatten(prefix, metrics):
                if isinstance(metrics, dict):
                    for k, v in metrics.items():
                        _flatten(f"{prefix}/{k}" if prefix else str(k), v)
                else:
                    flat[prefix] = metrics

            _flatten("", results)
            self.trainer.storage.put_scalars(smoothing_hint=False, **flat)

    def after_step(self):
        if self._period > 0 and (self.trainer.iter + 1) % self._period == 0:
            if self.trainer.iter != self.trainer.max_iter - 1:
                self._do_eval()

    def after_train(self):
        # only eval when training actually reached max_iter (d2 EvalHook
        # semantics) — otherwise an earlier exception would be masked by an
        # eval over a half-built trainer state
        if self.trainer.iter + 1 >= self.trainer.max_iter:
            self._do_eval()


class LRSchedulerHook(HookBase):
    """Logs the scheduled LR (the schedule itself lives inside the optax
    transformation; nothing to mutate — functional update, unlike the torch
    scheduler object this replaces)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        self.trainer.storage.put_scalar(
            "lr", float(self._schedule(self.trainer.iter)), smoothing_hint=False
        )


class LossEvalHook(HookBase):
    """Periodic validation-loss evaluation through branch="val_loss".

    Parity target: ubteacher LossEvalHook (unbias/ubteacher/engine/hooks.py:
    10-119) — runs the model in loss mode over a val stream and logs the mean
    total loss (for both student and teacher when a teacher is present)."""

    def __init__(self, eval_period: int, model, val_iter_fn: Callable[[], "object"],
                 max_batches: int = 25):
        self._period = eval_period
        self._model = model
        self._val_iter_fn = val_iter_fn
        self._max_batches = max_batches
        self._loss_fn = None

    def _compute(self, params) -> float:
        import jax
        import jax.numpy as jnp
        import numpy as np

        if self._loss_fn is None:
            @jax.jit
            def loss_one(params, batch, key):
                losses = self._model.apply(
                    {"params": params}, batch, key, branch="val_loss"
                )
                return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

            self._loss_fn = loss_one
        totals = []
        key = jax.random.PRNGKey(0)
        for i, batch in enumerate(self._val_iter_fn()):
            if i >= self._max_batches:
                break
            totals.append(float(self._loss_fn(params, batch, jax.random.fold_in(key, i))))
        return float(np.mean(totals)) if totals else 0.0

    def after_step(self):
        if self._period <= 0 or (self.trainer.iter + 1) % self._period != 0:
            return
        state = self.trainer.state
        self.trainer.storage.put_scalar(
            "val_total_loss_student", self._compute(state["params"]), smoothing_hint=False
        )
        if "teacher_params" in state:
            self.trainer.storage.put_scalar(
                "val_total_loss_teacher", self._compute(state["teacher_params"]),
                smoothing_hint=False,
            )


class JaxProfilerHook(HookBase):
    """Dump an xplane trace for iterations in [start, stop) — the TPU-native
    replacement of the AutogradProfiler chrome-trace hook."""

    def __init__(self, start_iter: int, stop_iter: int, log_dir: str):
        self._start = start_iter
        self._stop = stop_iter
        self._dir = log_dir
        self._active = False

    def before_step(self):
        import jax

        if self.trainer.iter == self._start and not self._active:
            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        import jax

        if self.trainer.iter + 1 >= self._stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
