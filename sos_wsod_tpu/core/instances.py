"""Fixed-capacity, mask-validated containers (pytrees).

TPU-native replacement for detectron2's variable-length ``Instances``
(reference: uwsod/detectron2/structures/instances.py). XLA requires static
shapes, so every per-image collection (proposals, pseudo-GT, detections) is a
fixed-capacity array bundle plus a boolean ``valid`` mask. These are plain
frozen dataclasses registered as pytrees, so they pass through jit / vmap /
shard_map unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class Proposals:
    """Per-image proposal set, padded to a static capacity P.

    boxes: (..., P, 4) XYXY in current image coords.
    objectness: (..., P) objectness logits (MCG/SS scores for stage 1).
    valid: (..., P) bool.
    """

    boxes: jnp.ndarray
    objectness: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


@_pytree_dataclass
class GroundTruth:
    """Per-image (pseudo-)ground-truth, padded to static capacity G.

    classes: (..., G) int32 in [0, num_classes); scores/weights per pseudo-GT
    confidence (reference gt_scores / gt_weights); index: the proposal slot the
    pseudo box came from (gt_index, used to mirror targets across views,
    roi_heads_oicrplus.py:327-371). valid masks real rows.
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    scores: jnp.ndarray
    weights: jnp.ndarray
    index: jnp.ndarray
    valid: jnp.ndarray


@_pytree_dataclass
class Detections:
    """Padded per-image detections (post-NMS)."""

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


def pad_to(x: jnp.ndarray, capacity: int, axis: int = 0, fill=0):
    n = x.shape[axis]
    if n == capacity:
        return x
    if n > capacity:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, capacity)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, capacity - n)
    return jnp.pad(x, pad, constant_values=fill)


def make_proposals(boxes, objectness, capacity: int) -> Tuple[Proposals, int]:
    """Host-side helper: pad/truncate raw arrays into a Proposals bundle."""
    n = min(boxes.shape[0], capacity)
    import numpy as np

    b = np.zeros((capacity, 4), np.float32)
    o = np.zeros((capacity,), np.float32)
    v = np.zeros((capacity,), bool)
    b[:n] = boxes[:n]
    o[:n] = objectness[:n]
    v[:n] = True
    return Proposals(boxes=b, objectness=o, valid=v), n
