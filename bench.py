"""Benchmark: stage-1 OICR+ training step throughput on one real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured program: the full jitted train step (4-view VGG16 forward, ROIPool over
4k proposals x 4 views, WSDDN MIL + K=4 MIST/refine losses, backward, SGD
update) at the reference's production shapes (voc07_oicr_plus.yaml: min-size
~688, 4000 proposals, batch 1 image/chip like the reference's 1 image/GPU).

Steps are executed as lax.scan supersteps (TPU.SCAN_STEPS=8, one dispatch per
8 optimizer steps) — the production trainer configuration for remote-attached
chips, where per-dispatch host overhead (~300 ms) would otherwise dwarf the
~60 ms of device compute per step. Timing is closed with a device_get of the
final metrics (a host readback is the only true synchronization through the
axon tunnel; block_until_ready can return early).

Baseline: the reference publishes no throughput numbers (SURVEY.md §6). We use
a fixed 2.0 images/sec/GPU estimate for the reference's stage-1 multi-view
VGG16 training on a V100-class GPU (batch 1/GPU, two-scale backbone at
~688x1000 plus flips); see BASELINE.md for the derivation. vs_baseline =
images/sec/chip / 2.0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache: the stage-1 train step takes ~10 min to compile
# through the TPU tunnel; cached reruns start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

SCAN_STEPS = int(os.environ.get("SOS_BENCH_SCAN", "8"))
BATCH = int(os.environ.get("SOS_BENCH_BATCH", "1"))  # images per chip


def main():
    import jax
    import jax.numpy as jnp

    from sos_wsod_tpu.engine.trainer import make_stage1_train_step
    from sos_wsod_tpu.models.meta.rcnn_wsl import MultiInputRCNN
    from sos_wsod_tpu.solver.build import torch_sgd, warmup_multistep_lr
    from __graft_entry__ import _tiny_image_batch

    # production stage-1 shapes: scale1 688x1024, scale2 576x864, P=4096
    rng = np.random.RandomState(0)
    p = 4096
    batch1 = _tiny_image_batch(rng, p=p, h1=688, w1=1024, h2=576, w2=864)
    # (K, B=1, ...) superbatch, device-resident across iterations
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None, None],
                                   (SCAN_STEPS, BATCH) + x.shape), batch1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = MultiInputRCNN(num_classes=20, seed_cap=1024, dtype=jnp.bfloat16)
    one = jax.tree_util.tree_map(lambda x: x[0, 0], batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, one, train=True
    )["params"]
    tx = torch_sgd(warmup_multistep_lr(1e-3, (35000,)), momentum=0.9)
    state = {"params": params, "opt_state": tx.init(params), "iter": jnp.zeros((), jnp.int32)}

    step = make_stage1_train_step(model, tx, mesh=None, donate=True,
                                  scan_steps=SCAN_STEPS)
    key = jax.random.key(2, impl="unsafe_rbg")  # hw-RNG dropout (TPU.PRNG_IMPL)

    # warmup / compile; device_get is the true sync point through the tunnel
    state, m = step(state, batch, key)
    jax.device_get(m)

    iters = 4  # supersteps -> 32 optimizer steps / images
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    jax.device_get(m)
    dt = time.perf_counter() - t0

    imgs_per_sec = iters * SCAN_STEPS * BATCH / dt
    baseline = 2.0  # assumed reference GPU images/sec (see module docstring)
    print(json.dumps({
        "metric": "stage1_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
