"""Device mesh + sharded training-step utilities.

TPU-native replacement for the reference's NCCL data-parallel runtime
(reference: detectron2/detectron2/engine/launch.py:27-123 — mp.spawn +
DistributedDataParallel; utils/comm.py gather/all_gather helpers). Instead of
one process per accelerator with explicit all-reduce, we build a
``jax.sharding.Mesh`` over all visible devices, annotate the batch with a
'data'-axis sharding and keep params replicated; XLA inserts the gradient
all-reduce (psum) over ICI automatically when jit differentiates the
batch-mean loss. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no code changes in the step.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data", devices: Optional[Sequence] = None,
              model_axis_size: int = 1) -> Mesh:
    """1-D data mesh, or a (data, model) 2-D mesh when model_axis_size > 1
    (tensor parallelism for the DAN fc stack — parallel/sharding_rules.py).
    The model axis takes the FASTEST-varying device positions so its
    all-reduces ride adjacent-chip ICI links."""
    devices = list(devices) if devices is not None else jax.devices()
    if model_axis_size > 1:
        n = len(devices)
        if n % model_axis_size != 0:
            raise ValueError(
                f"{n} devices not divisible by MODEL_AXIS_SIZE={model_axis_size}")
        grid = np.asarray(devices).reshape(n // model_axis_size, model_axis_size)
        return Mesh(grid, (axis_name, "model"))
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh; everything else local."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch (leading dim divisible by mesh size) onto the mesh."""
    sh = data_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    assert global_batch % n == 0, f"batch {global_batch} not divisible by {n} devices"
    return global_batch // n


def process_gather(objs: list) -> list:
    """Gather per-host python objects to every host (multi-host eval dumps).

    Single-process: identity. Multi-host: uses
    jax.experimental.multihost_utils.process_allgather on pickled payloads —
    the TPU-native analog of comm.gather in the reference evaluators."""
    if jax.process_count() == 1:
        return objs
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(objs), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(gathered, sizes.reshape(-1)):
        out.extend(pickle.loads(row[: int(size)].tobytes()))
    return out
