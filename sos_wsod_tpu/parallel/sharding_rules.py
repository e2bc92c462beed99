"""Parameter-sharding rules: tensor parallelism as pjit metadata.

The reference scales with data parallelism only (detectron2 DDP,
detectron2/engine/launch.py:27-123) and replicates all ~330 MB of OICR+
parameters per GPU — fc6 alone (25088x4096) is 103M params. On TPU the
idiomatic alternative is GSPMD: keep the MODEL code untouched and declare a
PartitionSpec per parameter; jit inserts the collectives (scaling-book
recipe: pick a mesh, annotate shardings, let XLA do the rest).

The DAN fc stack gets the Megatron MLP split over the "model" mesh axis:
fc1 column-parallel (kernel (25088, 4096) -> P(None, "model"), bias sharded
alike) and fc2 row-parallel (kernel (4096, 4096) -> P("model", None)); the
single all-reduce XLA inserts after fc2 restores replicated activations for
the WSDDN/refinement heads. Everything else (VGG convs, heads) stays
replicated — at these sizes ICI all-gathers would cost more than they save.

Rules apply by PATH SUFFIX, so the same table shards the optimizer's
momentum mirror (optax trace .../dan/fc1/kernel) without special-casing.
"""
from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on "a/b/c" path, spec axis names; None = replicated dim)
DAN_TP_RULES: Tuple[Tuple[str, Tuple], ...] = (
    (r"dan/fc1/kernel$", (None, "model")),
    (r"dan/fc1/bias$", ("model",)),
    (r"dan/fc2/kernel$", ("model", None)),
)


def path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            parts.append(str(k))
    return "/".join(parts)


def spec_for(path: str, x, mesh: Mesh,
             rules: Sequence[Tuple[str, Tuple]] = DAN_TP_RULES) -> P:
    """PartitionSpec for one leaf; falls back to replicated whenever a rule's
    sharded dimension would not divide evenly (e.g. a config with an odd
    fc width) so enabling TP can never crash a model it doesn't fit."""
    ndim = getattr(x, "ndim", 0)
    shape = getattr(x, "shape", ())
    for pat, spec in rules:
        if re.search(pat, path) and ndim == len(spec):
            ok = True
            for dim, ax in zip(shape, spec):
                if ax is not None and dim % mesh.shape[ax] != 0:
                    ok = False
            if ok:
                return P(*spec)
    return P()


def state_shardings(state, mesh: Mesh,
                    rules: Sequence[Tuple[str, Tuple]] = DAN_TP_RULES):
    """NamedSharding pytree for a trainer state (params + opt mirror + step
    counters). Pass the real state or a ShapeDtypeStruct tree."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: NamedSharding(mesh, spec_for(path_str(kp), x, mesh, rules)),
        state)


def place_state(state, shardings):
    """device_put each leaf onto its NamedSharding (host -> mesh)."""
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def tp_enabled(mesh) -> bool:
    return mesh is not None and "model" in mesh.axis_names and \
        mesh.shape["model"] > 1
