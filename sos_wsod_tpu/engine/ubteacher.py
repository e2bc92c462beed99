"""Unbiased-Teacher trainer (stage 3) and the plain baseline trainer (stage 2).

Parity target: unbias/ubteacher/engine/trainer.py —
 - BaselineTrainer (:39-257): plain supervised training over the labeled split;
 - UBTeacherTrainer.run_step_full_semisup (:436-541): burn-in on labeled data,
   teacher <- student copy at BURN_UP_STEP (keep_rate 0), per-step EMA
   (keep_rate 0.9996, :588-604), teacher no-grad inference on weak unlabeled,
   score-threshold 0.7 + multi-label pseudo-box filter (:362-400), student
   losses on (label_q + label_k) and pseudo-labeled strong unlabeled with reg
   losses zeroed and cls losses x UNSUP_LOSS_WEIGHT (:528-541).

TPU-native shape: the whole semisup step — EMA update, teacher forward,
thresholding, student forward/backward, SGD — is ONE jit program; the teacher
is a second params pytree, its EMA a tree_map inside the step (the reference
walks state_dicts on host). Burn-in uses a separate jitted supervised program
so the two phases don't recompile each other.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .trainer import TrainerBase, make_train_rng, stack_batch

logger = logging.getLogger(__name__)

# keys the jitted programs consume; everything else (image_id, orig_hw, ...)
# is host-side metadata and must not enter the program signature (it would
# fragment the jit cache)
MODEL_BATCH_KEYS = (
    "image", "image_hw", "gt_boxes", "gt_classes", "gt_valid", "multi_label_oh",
)


def filter_model_batch(batch):
    return {k: v for k, v in batch.items() if k in MODEL_BATCH_KEYS}


def ema_update(teacher_params, student_params, keep_rate):
    """teacher = keep_rate * teacher + (1 - keep_rate) * student
    (reference _update_teacher_model, trainer.py:588-604)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * keep_rate + s.astype(t.dtype) * (1.0 - keep_rate),
        teacher_params, student_params,
    )


def threshold_pseudo_boxes(det_boxes, det_scores, det_classes, det_valid,
                           multi_label_oh, thresh: float, has_multi_label: bool):
    """Teacher detections -> pseudo-GT mask (threshold_bbox 'roih' path)."""
    keep = det_valid & (det_scores > thresh)
    if has_multi_label:
        cls_ok = jnp.take_along_axis(
            multi_label_oh.astype(bool), det_classes.astype(jnp.int32), axis=-1
        ) if multi_label_oh.ndim == det_classes.ndim else multi_label_oh[det_classes]
        keep = keep & cls_ok
    return keep


def make_supervised_step(model, tx: optax.GradientTransformation, mesh=None,
                         data_axis: str = "data", donate: bool = True) -> Callable:
    """Jitted supervised train step over a stacked image batch (burn-in /
    stage-2 baseline). state: {'params','opt_state','iter'}."""

    def loss_fn(params, batch, rng):
        b = batch["image"].shape[0]
        keys = jax.random.split(rng, b)

        def per_image(img_batch, key):
            return model.apply({"params": params}, img_batch, key, branch="supervised")

        losses = jax.vmap(per_image)(batch, keys)
        mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
        total = sum(jnp.asarray(v, jnp.float32) for v in mean_losses.values())
        return total, mean_losses

    def step(state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "iter": state["iter"] + 1}
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return _jit_with_mesh(step, mesh, data_axis, donate)


def make_semisup_step(
    model,
    tx: optax.GradientTransformation,
    *,
    unsup_loss_weight: float = 2.0,
    ema_keep_rate: float = 0.9996,
    bbox_threshold: float = 0.7,
    has_multi_label: bool = False,
    teacher_update_iter: int = 1,
    burn_up_step: int = 0,
    pseudo_cap: int = 100,
    mesh=None,
    data_axis: str = "data",
    donate: bool = True,
) -> Callable:
    """One jitted semisup step.

    state: {'params' (student), 'teacher_params', 'opt_state', 'iter'}
    batch: {'label_q', 'label_k', 'unlabel_q', 'unlabel_k'} — each a stacked
    image-batch pytree; unlabel_* include 'multi_label_oh' (B, K).
    """

    def step(state, batch, rng):
        it = state["iter"]
        # EMA (or full copy at the burn-in boundary)
        do_update = ((it - burn_up_step) % teacher_update_iter) == 0
        keep = jnp.where(it == burn_up_step, 0.0,
                         jnp.where(do_update, ema_keep_rate, 1.0))
        teacher = ema_update(state["teacher_params"], state["params"], keep)

        # teacher pseudo-labels on weak unlabeled (no grad by construction)
        def teacher_infer(img_batch):
            det, _, _ = model.apply({"params": teacher}, img_batch, branch="unsup_data_weak")
            return det

        u_k = batch["unlabel_k"]
        det = jax.vmap(teacher_infer)({k: v for k, v in u_k.items() if k != "multi_label_oh"})
        keep_mask = jax.vmap(
            lambda b, s, c, v, ml: threshold_pseudo_boxes(
                b, s, c, v, ml, bbox_threshold, has_multi_label
            )
        )(det.boxes, det.scores, det.classes, det.valid, u_k["multi_label_oh"])
        pseudo_boxes = jax.lax.stop_gradient(det.boxes[:, :pseudo_cap])
        pseudo_classes = jax.lax.stop_gradient(det.classes[:, :pseudo_cap])
        pseudo_valid = jax.lax.stop_gradient(keep_mask[:, :pseudo_cap])

        def loss_fn(params, rng):
            k_l, k_u = jax.random.split(rng)

            def sup_image(img_batch, key):
                return model.apply({"params": params}, img_batch, key, branch="supervised")

            # supervised: label_q + label_k
            lbl = jax.tree_util.tree_map(
                lambda a, b_: jnp.concatenate([a, b_], axis=0),
                batch["label_q"], batch["label_k"],
            )
            bl = lbl["image"].shape[0]
            sup_losses = jax.vmap(sup_image)(lbl, jax.random.split(k_l, bl))
            sup_losses = jax.tree_util.tree_map(jnp.mean, sup_losses)

            # pseudo-supervised: strong unlabeled with teacher boxes
            u_q = {k: v for k, v in batch["unlabel_q"].items() if k != "multi_label_oh"}
            u_q = dict(u_q)
            u_q["gt_boxes"] = pseudo_boxes
            u_q["gt_classes"] = pseudo_classes
            u_q["gt_valid"] = pseudo_valid
            bu = u_q["image"].shape[0]
            uns_losses = jax.vmap(sup_image)(u_q, jax.random.split(k_u, bu))
            uns_losses = jax.tree_util.tree_map(jnp.mean, uns_losses)

            total = sum(jnp.asarray(v, jnp.float32) for v in sup_losses.values())
            metrics = dict(sup_losses)
            for k, v in uns_losses.items():
                w = 0.0 if k in ("loss_rpn_loc", "loss_box_reg") else unsup_loss_weight
                total = total + jnp.asarray(v, jnp.float32) * w
                metrics[k + "_pseudo"] = v
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], rng
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics["total_loss"] = total
        metrics["num_pseudo_boxes"] = jnp.mean(jnp.sum(pseudo_valid, axis=-1).astype(jnp.float32))
        new_state = {
            "params": params,
            "teacher_params": teacher,
            "opt_state": opt_state,
            "iter": it + 1,
        }
        return new_state, metrics

    return _jit_with_mesh(step, mesh, data_axis, donate)


def _jit_with_mesh(step, mesh, data_axis, donate):
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(data_axis))
        return jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


class UBTeacherTrainer(TrainerBase):
    """Host loop around the two jitted programs (burn-in, full semisup)."""

    def __init__(self, cfg, model=None, data_iter=None, mesh=None,
                 rng: Optional[jax.Array] = None):
        super().__init__()
        from ..models.meta.rcnn import GeneralizedRCNN
        from ..solver.build import build_optimizer

        self.cfg = cfg
        self.model = model if model is not None else GeneralizedRCNN.from_cfg(cfg)
        self.data_iter = data_iter
        self.mesh = mesh
        self.tx = build_optimizer(cfg)
        self.burn_up_step = cfg.SEMISUPNET.BURN_UP_STEP
        self.burnin_step_fn = make_supervised_step(self.model, self.tx, mesh=mesh)
        self.semisup_step_fn = make_semisup_step(
            self.model, self.tx,
            unsup_loss_weight=cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT,
            ema_keep_rate=cfg.SEMISUPNET.EMA_KEEP_RATE,
            bbox_threshold=cfg.SEMISUPNET.BBOX_THRESHOLD,
            has_multi_label=cfg.SEMISUPNET.HAS_MULTI_LABEL,
            teacher_update_iter=cfg.SEMISUPNET.TEACHER_UPDATE_ITER,
            burn_up_step=cfg.SEMISUPNET.BURN_UP_STEP,
            pseudo_cap=cfg.TEST.DETECTIONS_PER_IMAGE,
            mesh=mesh,
        )
        self.burn_up_with_strong = cfg.SEMISUPNET.BURN_UP_WITH_STRONG_AUG
        self.rng = rng if rng is not None else make_train_rng(cfg)
        self.state: Optional[Dict[str, Any]] = None

    def init_state(self, example_batch) -> Dict[str, Any]:
        one = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)[0]), example_batch["label_k"]
        )
        k0, k1, self.rng = jax.random.split(self.rng, 3)
        params = self.model.init(k0, one, k1, branch="supervised")["params"]
        self.state = {
            "params": params,
            "teacher_params": jax.tree_util.tree_map(jnp.copy, params),
            "opt_state": self.tx.init(params),
            "iter": jnp.zeros((), jnp.int32),
        }
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        return self.state

    def run_step(self):
        import time

        t0 = time.perf_counter()
        batch = next(self.data_iter)
        batch = {
            k: filter_model_batch(stack_batch(v) if isinstance(v, list) else v)
            for k, v in batch.items()
        }
        data_time = time.perf_counter() - t0
        if self.state is None:
            self.init_state(batch)
        self.rng, key = jax.random.split(self.rng)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = {k: shard_batch(v, self.mesh) for k, v in batch.items()}

        if self.iter < self.burn_up_step:
            if self.burn_up_with_strong:
                sup = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([jnp.asarray(a), jnp.asarray(b)]),
                    batch["label_q"], batch["label_k"],
                )
            else:
                sup = batch["label_k"]
            # burn-in state lacks teacher keys in the step signature: run the
            # supervised program on the student sub-state
            sub = {k: self.state[k] for k in ("params", "opt_state", "iter")}
            sub, metrics = self.burnin_step_fn(sub, sup, key)
            self.state.update(sub)
        else:
            self.state, metrics = self.semisup_step_fn(self.state, batch, key)
        metrics = jax.device_get(metrics)
        total = float(metrics["total_loss"])
        if not np.isfinite(total):
            raise FloatingPointError(f"Loss became {total} at iteration {self.iter}")
        self.storage.put_scalar("data_time", data_time)
        for k, v in metrics.items():
            self.storage.put_scalar(k, float(v))

    def state_dict(self) -> Dict[str, Any]:
        return self.state


class BaselineTrainer(TrainerBase):
    """Stage-2 supervised trainer (pseudo-FSOD over the labeled split)."""

    def __init__(self, cfg, model=None, data_iter=None, mesh=None,
                 rng: Optional[jax.Array] = None):
        super().__init__()
        from ..models.meta.rcnn import GeneralizedRCNN
        from ..solver.build import build_optimizer

        self.cfg = cfg
        self.model = model if model is not None else GeneralizedRCNN.from_cfg(cfg)
        self.data_iter = data_iter
        self.mesh = mesh
        self.tx = build_optimizer(cfg)
        self.step_fn = make_supervised_step(self.model, self.tx, mesh=mesh)
        self.rng = rng if rng is not None else make_train_rng(cfg)
        self.state: Optional[Dict[str, Any]] = None

    def init_state(self, example_batch) -> Dict[str, Any]:
        one = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[0]), example_batch)
        k0, k1, self.rng = jax.random.split(self.rng, 3)
        params = self.model.init(k0, one, k1, branch="supervised")["params"]
        self.state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "iter": jnp.zeros((), jnp.int32),
        }
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
        return self.state

    def run_step(self):
        import time

        t0 = time.perf_counter()
        batch = next(self.data_iter)
        if isinstance(batch, list):
            batch = stack_batch(batch)
        batch = filter_model_batch(batch)
        data_time = time.perf_counter() - t0
        if self.state is None:
            self.init_state(batch)
        self.rng, key = jax.random.split(self.rng)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh)
        self.state, metrics = self.step_fn(self.state, batch, key)
        metrics = jax.device_get(metrics)
        total = float(metrics["total_loss"])
        if not np.isfinite(total):
            raise FloatingPointError(f"Loss became {total} at iteration {self.iter}")
        self.storage.put_scalar("data_time", data_time)
        for k, v in metrics.items():
            self.storage.put_scalar(k, float(v))

    def state_dict(self) -> Dict[str, Any]:
        return self.state
