"""Training loop: hook-driven TrainerBase + the stage-1 WSOD trainer.

Parity targets:
 - d2 TrainerBase/SimpleTrainer loop semantics (reference:
   detectron2/detectron2/engine/train_loop.py) — before/after hooks, EventStorage,
   NaN detection on the summed loss;
 - the stage-1 ``Trainer`` (uwsod/projects/WSL/tools/train_net_multi.py:58-380):
   iter-size gradient accumulation (WSL.ITER_SIZE), empty-batch skipping (done in
   the data pipeline), resume restoring the head's iteration counter.

TPU-native shape: one jit-compiled SPMD program performs forward+backward+update
for all images of the global batch — per-image work is vmapped, the batch axis
is sharded over the mesh's 'data' axis, params/optimizer state are replicated,
and XLA inserts the gradient psum over ICI (no DDP wrapper, no NCCL; compare
detectron2/detectron2/engine/launch.py:27-123).
"""
from __future__ import annotations

import logging
import weakref
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.events import EventStorage
from .hooks import HookBase

logger = logging.getLogger(__name__)


class TrainerBase:
    def __init__(self):
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks: List[Optional[HookBase]]):
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    #: iterations consumed per run_step (scan-K supersteps advance by K)
    step_stride: int = 1

    def train(self, start_iter: int, max_iter: int):
        logger.info("Starting training from iteration %d", start_iter)
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for base_iter in range(start_iter, max_iter, self.step_stride):
                    self.iter = base_iter
                    self.before_step()
                    self.run_step()
                    # replay after-step bookkeeping for every iteration the
                    # (super)step covered so periodic hooks fire exactly
                    for self.iter in range(
                        base_iter, min(base_iter + self.step_stride, max_iter)
                    ):
                        self.storage.iter = self.iter
                        self.after_step()
                        self.storage.step()
                self.iter += 1
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        self.storage.iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        raise NotImplementedError


def make_train_rng(cfg) -> jax.Array:
    """Training PRNG key honoring TPU.PRNG_IMPL (hardware rbg by default —
    the threefry dropout-mask generation costs ~7 ms/step at stage-1
    production shapes; see config/defaults.py)."""
    impl = str(getattr(cfg.TPU, "PRNG_IMPL", "") or "threefry2x32")
    try:
        # typed key: carries its impl through split/fold_in (a raw
        # PRNGKey(..., impl=) array would be re-wrapped as threefry)
        return jax.random.key(max(cfg.SEED, 0), impl=impl)
    except (TypeError, ValueError):  # unknown impl name on this jax
        return jax.random.key(max(cfg.SEED, 0))


def stack_batch(samples: List[Dict[str, np.ndarray]], keys=None) -> Dict[str, np.ndarray]:
    """Stack per-image mapper outputs into a leading batch axis. All samples
    must share canvas/capacity shapes (the loader's bucketing guarantees it)."""
    keys = keys or [k for k, v in samples[0].items() if isinstance(v, np.ndarray)]
    return {k: np.stack([s[k] for s in samples]) for k in keys}


def make_stage1_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh=None,
    data_axis: str = "data",
    donate: bool = True,
    scan_steps: int = 1,
    inject_iter: bool = False,
    inject_cpgs: bool = False,
    state_shardings=None,
) -> Callable:
    """Build the jitted SPMD train step.

    state: {'params', 'opt_state', 'iter'}; batch: pytree with leading global
    batch axis (divisible by mesh size); rng: scalar PRNG key (dropout).
    Returns (new_state, metrics) with metrics reduced to scalars.

    scan_steps > 1 runs K optimizer steps per dispatch via ``lax.scan`` over a
    (K, B, ...) superbatch (metrics come back stacked, (K, ...)). One dispatch
    per K steps amortizes per-execute host/tunnel overhead on remote-attached
    TPUs. (Measured r3 at production shapes the step is DEVICE-bound — ~349 ms
    device vs ~355 ms wall, see tools/profile_stage1.py — so supersteps buy
    little there; they matter for small/fast step programs.) The reference has
    no analog — its GPU runtime is dispatch-cheap; this is the TPU-native
    replacement for the tight CUDA step loop.
    """

    def loss_fn(params, batch, rng, it):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, b)

        def per_image(img_batch, key):
            if inject_iter or inject_cpgs:
                img_batch = dict(img_batch, iter=it)
            if inject_cpgs:
                # CSC/WSJDS: class-peak-response maps from a vjp of the
                # image-score forward (rcnn_wsl_single.compute_cpgs)
                img_batch = dict(
                    img_batch,
                    cpgs=model.compute_cpgs(
                        {"params": params}, img_batch, rngs={"dropout": key}
                    ),
                )
            return model.apply(
                {"params": params}, img_batch, train=True, rngs={"dropout": key}
            )

        losses = jax.vmap(per_image)(batch, keys)  # dict of (B,)
        mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
        total = jnp.asarray(0.0, jnp.float32)
        # non-"loss" keys are training metrics (per-branch accuracy/fg
        # counters) riding along in the aux dict, not loss terms
        for k, v in mean_losses.items():
            if k.startswith("loss"):
                total = total + v
        return total, mean_losses

    def step(state, batch, rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng, state["iter"]
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "iter": state["iter"] + 1}
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    if scan_steps > 1:
        single = step

        def step(state, superbatch, rng):  # noqa: F811 — scan-K wrapper
            def body(carry, xs):
                sub_batch, i = xs
                new_carry, m = single(carry, sub_batch, jax.random.fold_in(rng, i))
                return new_carry, m

            idx = jnp.arange(scan_steps)
            state, metrics = jax.lax.scan(body, state, (superbatch, idx))
            return state, metrics  # metrics stacked (K, ...)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        # tensor parallelism: state_shardings carries per-parameter specs
        # (parallel/sharding_rules.py); None = plain DP (all replicated)
        st = repl if state_shardings is None else state_shardings
        # with scan_steps the superbatch is (K, B, ...): shard the batch axis
        data = NamedSharding(mesh, P(None, data_axis) if scan_steps > 1 else P(data_axis))
        return jax.jit(
            step,
            in_shardings=(st, data, repl),
            out_shardings=(st, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


class Stage1Trainer(TrainerBase):
    """OICR+ multi-input trainer over a jitted SPMD step."""

    def __init__(
        self,
        cfg,
        model=None,
        data_iter=None,
        mesh=None,
        rng: Optional[jax.Array] = None,
    ):
        super().__init__()
        from ..models.meta.rcnn_wsl import MultiInputRCNN
        from ..solver.build import build_optimizer

        self.cfg = cfg
        self.model = model if model is not None else MultiInputRCNN.from_cfg(cfg)
        self.data_iter = data_iter
        self.mesh = mesh

        tx = build_optimizer(cfg)
        iter_size = int(getattr(cfg.WSL, "ITER_SIZE", 1) or 1)
        if iter_size > 1:
            # reference accumulates grads for ITER_SIZE sub-iters then steps
            # (train_net_multi.py run_step); optax.MultiSteps averages them,
            # matching the reference's auto_scale_workers LR/iter_size rescale.
            tx = optax.MultiSteps(tx, every_k_schedule=iter_size)
        self.tx = tx
        self.step_stride = max(1, int(getattr(cfg.TPU, "SCAN_STEPS", 1) or 1))
        self.rng = rng if rng is not None else make_train_rng(cfg)
        self.state: Optional[Dict[str, Any]] = None
        # tensor parallelism: a mesh with a >1 "model" axis shards the DAN fc
        # stack Megatron-style (parallel/sharding_rules.py); the sharding
        # tree needs the state structure, so jitted steps build lazily after
        # init_state
        self._state_shardings = None
        self._train_step_fn = None

    @property
    def train_step(self):
        if self._train_step_fn is None:
            head = getattr(self.model, "head", None)
            self._train_step_fn = make_stage1_train_step(
                self.model, self.tx, mesh=self.mesh,
                scan_steps=self.step_stride,
                inject_iter=head in ("CMIL", "CSC", "WSJDS"),
                inject_cpgs=head in ("CSC", "WSJDS"),
                state_shardings=self._state_shardings,
            )
        return self._train_step_fn

    def init_state(self, example_batch) -> Dict[str, Any]:
        ix = (0, 0) if self.step_stride > 1 else (0,)
        one = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)[ix]), example_batch)
        k0, k1, self.rng = jax.random.split(self.rng, 3)
        params = self.model.init({"params": k0, "dropout": k1}, one, train=True)["params"]
        self.state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "iter": jnp.zeros((), jnp.int32),
        }
        if self.mesh is not None:
            from ..parallel.sharding_rules import (
                place_state, state_shardings, tp_enabled)

            if tp_enabled(self.mesh):
                self._state_shardings = state_shardings(self.state, self.mesh)
                self.state = place_state(self.state, self._state_shardings)
            else:
                from ..parallel.mesh import replicate

                self.state = replicate(self.state, self.mesh)
        return self.state

    def _single_train_step(self):
        """Lazily-built scan_steps=1 step for the misaligned tail (resume from
        a checkpoint whose iter is not SCAN_STEPS-aligned)."""
        if getattr(self, "_single_step_fn", None) is None:
            head = getattr(self.model, "head", None)
            self._single_step_fn = make_stage1_train_step(
                self.model, self.tx, mesh=self.mesh, scan_steps=1,
                inject_iter=head in ("CMIL", "CSC", "WSJDS"),
                inject_cpgs=head in ("CSC", "WSJDS"),
                state_shardings=self._state_shardings,
            )
        return self._single_step_fn

    def run_step(self):
        import time

        # clamp the tail: never consume batches / apply updates past max_iter
        k = self.step_stride
        if getattr(self, "max_iter", None) is not None:
            k = max(1, min(k, self.max_iter - self.iter))
        superstep = k == self.step_stride and self.step_stride > 1

        t0 = time.perf_counter()
        batches = []
        for _ in range(k):
            batch = next(self.data_iter)
            if isinstance(batch, list):
                batch = stack_batch(batch)
            batches.append(batch)
        data_time = time.perf_counter() - t0

        if self.state is None:
            self.init_state(batches[0] if not superstep else jax.tree_util
                            .tree_map(lambda *xs: np.stack(xs), *batches))

        def place(batch, spec):
            if self.mesh is None:
                return batch
            # pre-place on the jitted step's in_shardings: the superbatch is
            # (K, B, ...) — the data axis is axis 1, NOT the leading scan axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, spec)
            if jax.process_count() > 1:
                # multi-host: the loader yielded this host's
                # 1/process_count share (rank-strided index stream,
                # data/build.py:training_index_stream); assemble the global
                # batch from the per-process shards without any host
                # all-gather — replaces the reference's per-rank PyTorch
                # DataLoaders + DistributedDataParallel scatter
                # (detectron2/engine/launch.py:27-123)
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        sh, np.asarray(x)), batch)
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

        from jax.sharding import PartitionSpec as P

        if superstep or self.step_stride == 1:
            batch = batches[0] if k == 1 else jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *batches)
            self.rng, key = jax.random.split(self.rng)
            batch = place(batch, P(None, "data") if superstep else P("data"))
            self.state, metrics = self.train_step(self.state, batch, key)
        else:
            # misaligned tail: k < SCAN_STEPS iterations left — run them as
            # plain single steps so exactly max_iter updates are applied
            step_fn = self._single_train_step()
            all_metrics = []
            for b in batches:
                self.rng, key = jax.random.split(self.rng)
                self.state, metrics = step_fn(self.state, place(b, P("data")), key)
                all_metrics.append(metrics)
            metrics = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *all_metrics)
        metrics = jax.device_get(metrics)
        # scan-K supersteps return stacked (K,) metrics — log the mean
        metrics = {k: float(np.mean(v)) for k, v in metrics.items()}
        total = metrics["total_loss"]
        if not np.isfinite(total):
            raise FloatingPointError(f"Loss became {total} at iteration {self.iter}")
        self.storage.put_scalar("data_time", data_time)
        for k, v in metrics.items():
            self.storage.put_scalar(k, v)

    def state_dict(self) -> Dict[str, Any]:
        return self.state
