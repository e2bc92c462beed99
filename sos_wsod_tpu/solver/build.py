"""Optimizer + LR schedules (optax).

Parity targets:
 - d2 build_optimizer (uwsod/detectron2/solver/build.py:162-181): SGD with
   momentum, per-param groups — bias LR x BIAS_LR_FACTOR, bias weight decay
   WEIGHT_DECAY_BIAS, optional separate LR scale for refinement branches
   (SOLVER.REFINE_SCALE_ON/REFINE_LR_SCALE), frozen backbone stages excluded.
 - WarmupMultiStepLR and the ubteacher WarmupTwoStageMultiStepLR
   (unbias/ubteacher/solver/lr_scheduler.py:8-52): per-milestone factor list.

torch-SGD semantics (not optax.sgd's): weight decay is added to the gradient
BEFORE momentum accumulation, and the update is lr * momentum_buffer.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    steps = jnp.asarray(list(steps), jnp.int32)

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        if warmup_iters > 0:
            if warmup_method == "linear":
                alpha = it / warmup_iters
                wf = warmup_factor * (1 - alpha) + alpha
            else:  # constant
                wf = jnp.asarray(warmup_factor, jnp.float32)
            wf = jnp.where(it >= warmup_iters, 1.0, wf)
        else:
            wf = 1.0
        decay = jnp.power(gamma, jnp.sum(it >= steps.astype(jnp.float32)))
        return base_lr * wf * decay

    return schedule


def warmup_two_stage_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    factor_list: Sequence[float],
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr = base * factor_list[#milestones passed] with linear warmup
    (unbias/ubteacher/solver/lr_scheduler.py:8-52)."""
    assert len(factor_list) == len(steps) + 1
    steps_a = jnp.asarray(list(steps), jnp.int32)
    factors = jnp.asarray(list(factor_list), jnp.float32)

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        if warmup_iters > 0:
            alpha = it / warmup_iters
            wf = warmup_factor * (1 - alpha) + alpha if warmup_method == "linear" else warmup_factor
            wf = jnp.where(it >= warmup_iters, 1.0, wf)
        else:
            wf = 1.0
        idx = jnp.sum(it >= steps_a.astype(jnp.float32)).astype(jnp.int32)
        return base_lr * wf * factors[idx]

    return schedule


def torch_sgd(
    schedule: Callable,
    momentum: float = 0.9,
    lr_scale_fn: Callable[[tuple], float] | None = None,
    weight_decay_fn: Callable[[tuple], float] | None = None,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.SGD with per-leaf lr scale / weight decay.

    lr_scale_fn/weight_decay_fn map a param path (tuple of str keys) to the
    group's LR multiplier / weight decay, implementing d2's param groups.
    """

    def path_map(params, fn, default):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        vals = [default if fn is None else fn(tuple(_key_str(k) for k in path)) for path, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, vals)

    def init(params):
        return {
            "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
            "lr_scale": path_map(params, lr_scale_fn, 1.0),
            "wd": path_map(params, weight_decay_fn, 0.0),
        }

    def update(grads, state, params):
        lr = schedule(state["count"])

        def upd(g, m, p, scale, wd):
            g = g + wd * p
            m_new = momentum * m + g
            d = g + momentum * m_new if nesterov else m_new
            return -lr * scale * d, m_new

        flat = jax.tree_util.tree_map(
            upd, grads, state["momentum"], params, state["lr_scale"], state["wd"]
        )
        updates = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_state = {
            "momentum": new_m,
            "count": state["count"] + 1,
            "lr_scale": state["lr_scale"],
            "wd": state["wd"],
        }
        return updates, new_state

    return optax.GradientTransformation(init, update)


def _key_str(k) -> str:
    return getattr(k, "key", getattr(k, "name", str(k)))


def d2_param_group_fns(cfg):
    """Reproduce d2's group rules: bias lr x BIAS_LR_FACTOR / wd
    WEIGHT_DECAY_BIAS; refinement-branch LR scale; frozen stages lr 0."""
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    refine_scale = cfg.SOLVER.REFINE_LR_SCALE if cfg.SOLVER.REFINE_SCALE_ON else 1.0
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT
    frozen = {f"plain{i}" for i in range(1, freeze_at + 1)} | {
        f"res{i}" for i in range(1, freeze_at + 1)
    } | ({"stem"} if freeze_at >= 1 else set())

    def lr_scale(path):
        if any(p in frozen for p in path):
            return 0.0
        scale = 1.0
        if path and path[-1] == "bias":
            scale *= bias_lr_factor
        if any(p.startswith("box_refinery") for p in path):
            scale *= refine_scale
        return scale

    def weight_decay(path):
        if any(p in frozen for p in path):
            return 0.0
        return wd_bias if (path and path[-1] == "bias") else wd

    return lr_scale, weight_decay


def build_optimizer(cfg, schedule=None) -> optax.GradientTransformation:
    if schedule is None:
        if cfg.SOLVER.LR_SCHEDULER_NAME == "WarmupTwoStageMultiStepLR":
            schedule = warmup_two_stage_multistep_lr(
                cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.FACTOR_LIST,
                cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_METHOD,
            )
        else:
            schedule = warmup_multistep_lr(
                cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
                cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.WARMUP_METHOD,
            )
    lr_scale, weight_decay = d2_param_group_fns(cfg)
    tx = torch_sgd(schedule, cfg.SOLVER.MOMENTUM, lr_scale, weight_decay, cfg.SOLVER.NESTEROV)
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        tx = optax.chain(clip, tx)
    return tx
