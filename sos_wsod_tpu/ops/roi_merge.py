"""ROIMerge: CMIL continuation-clique clustering of ROI class/det scores.

Parity target: the wsl ROIMerge kernel (uwsod/projects/WSL/wsl/layers/csrc/
ROIMerge/ROIMerge_cpu.cpp:32-289; used by WSDDNOutputLayers.forward_cmil,
fast_rcnn_wsddn.py:611-655). Greedy sequential clique forming over the top-200
score-sorted ROIs with a continuation threshold

    lambda(iter) = (log(t + .01) - log(.01)) / (log(max_epoch + .01) - log(.01)),
    t = cur_iter / size_epoch

then per-clique MEAN of cls/det scores; backward spreads the clique gradient
uniformly (grad / clique_size).

The clustering itself is inherently sequential, data-dependent host logic (the
reference runs it on CPU too): the cluster assignment runs as a numpy
callback via ``jax.pure_callback``, while the differentiable mean-merge /
uniform-split runs in XLA as segment ops — gradients flow on device; only the
integer assignment crosses the host boundary.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def getlambda(iter_frac: float, max_iter: float) -> float:
    low = 0.01
    return (math.log(iter_frac + low) - math.log(low)) / (math.log(max_iter + low) - math.log(low))


def roi_merge_assign(
    scores: np.ndarray,   # (R,) ROI scores S
    iou: np.ndarray,      # (R, R) J matrix
    cur_iter: int,
    max_epoch: int,
    size_epoch: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact clique assignment (ROIMerge_cpu.cpp:94-160). Returns
    (assignment I (R,) int32, clique sizes IC (num_id,) padded to R)."""
    num_roi = scores.shape[0]
    order = np.argsort(-scores, kind="stable")
    lam = getlambda(float(cur_iter) / float(size_epoch), float(max_epoch))
    ids = np.full(num_roi, -1, np.int32)
    top_k = min(num_roi, 200)
    cur_id = 0
    for t in range(top_k):
        n = order[t]
        if ids[n] != -1:
            continue
        ids[n] = cur_id
        end_num = min(t + 40, top_k)
        for tt in range(t, end_num):
            i = order[tt]
            if ids[i] != -1:
                continue
            in_clique = True
            for ttt in range(t, end_num):
                j = order[ttt]
                if ids[j] != cur_id:
                    continue
                if iou[i, j] < lam:
                    in_clique = False
                    break
            if in_clique:
                ids[i] = cur_id
        cur_id += 1
    for n in range(num_roi):
        if ids[n] == -1:
            ids[n] = cur_id
            cur_id += 1
    counts = np.zeros(num_roi, np.int32)  # padded to R (num_id <= R)
    np.add.at(counts, ids, 1)
    return ids, counts


def roi_merge(
    S: jnp.ndarray,       # (R,) or (R, 1) roi scores (host-visible, no grad)
    J: jnp.ndarray,       # (R, R) iou matrix
    C: jnp.ndarray,       # (R, K) cls scores (differentiable)
    D: jnp.ndarray,       # (R, K) det scores (differentiable)
    cur_iter: int,
    max_epoch: int,
    size_epoch: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (MC (R, K), MD (R, K), I (R,), IC (R,)) — merged scores padded
    to R rows (reference returns num_id rows; rows >= num_id are zero and the
    caller masks by IC > 0)."""
    r = S.shape[0]

    def host_assign(s, j):
        return roi_merge_assign(
            np.asarray(s, np.float32).reshape(-1), np.asarray(j, np.float32),
            cur_iter, max_epoch, size_epoch,
        )

    ids, counts = jax.pure_callback(
        host_assign,
        (jax.ShapeDtypeStruct((r,), jnp.int32), jax.ShapeDtypeStruct((r,), jnp.int32)),
        jax.lax.stop_gradient(S), jax.lax.stop_gradient(J),
    )
    inv = 1.0 / jnp.maximum(counts[ids], 1).astype(C.dtype)  # (R,)
    mc = jnp.zeros_like(C).at[ids].add(C * inv[:, None])
    md = jnp.zeros_like(D).at[ids].add(D * inv[:, None])
    return mc, md, ids, counts
