"""ROILabel: assign ROI labels from top-scoring seed proposals.

Parity target: the wsl ROILabel kernel (uwsod/projects/WSL/wsl/layers/csrc/
ROILabel/ROILabel_cpu.cpp:16-196; used by the WSJDS segmentation branch).
Semantics:

 1. for every present class (in class order), pick ``top_k`` distinct
    highest-scoring ROIs as seeds (a seed chosen for one class is excluded
    for later classes);
 2. every ROI is assigned the class/weight of its max-IoU seed;
 3. ROIs with IoU >= fg_thresh become foreground (first num_pos+1 in a
    random order), IoU in [bg_thresh_lo, bg_thresh_hi) become background
    (class = num_class, first num_neg+1), everything else keeps the class
    but gets weight 0;
 4. weight = CW[class] when class weights are given, else the seed score.

The reference shuffles with std::rand seeded by wall time; here the
permutation comes from an explicit jax PRNG key (deterministic, replayable).
The sampling caps are applied in closed form via cumulative sums over the
permuted accept flags — exact, given the standard disjoint thresholds
(bg_thresh_hi <= fg_thresh), instead of the kernel's sequential counter.
Everything is fixed-shape XLA; no host callback.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("top_k", "fg_thresh", "bg_thresh_hi",
                                   "bg_thresh_lo", "num_pos", "num_neg"))
def roi_label(
    scores: jnp.ndarray,        # (R, C) or (R, C+1) per-ROI class scores
    iou: jnp.ndarray,           # (R, R) proposal-pairwise IoU
    labels: jnp.ndarray,        # (C,) image-level one-hot labels
    valid: jnp.ndarray,         # (R,) proposal validity
    rng: jax.Array,             # permutation key (reference: srand(time))
    class_weights: Optional[jnp.ndarray] = None,  # (C,) CW
    *,
    top_k: int = 1,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.1,
    num_pos: int = 32,
    num_neg: int = 96,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (RL (R,) int32 in [0, C] with C = background, RW (R,) f32)."""
    assert bg_thresh_hi <= fg_thresh, (
        "closed-form caps require disjoint fg/bg bands")
    r = scores.shape[0]
    c = labels.shape[0]
    s = jnp.asarray(scores[:, :c], jnp.float32)
    s = jnp.where(valid[:, None], s, -jnp.inf)

    # --- 1. sequential distinct top-k seed selection (class-major order) ---
    def pick(carry, cls_k):
        taken, = carry
        cls = cls_k // top_k
        col = jnp.where(taken, -jnp.inf, s[:, cls])
        idx = jnp.argmax(col)
        present = labels[cls] >= 0.5
        score = col[idx]
        seed_valid = present & jnp.isfinite(score)
        taken = taken | (jnp.arange(r) == idx) & seed_valid
        return (taken,), (idx, cls, score, seed_valid)

    (_,), (seed_n, seed_c, seed_p, seed_ok) = jax.lax.scan(
        pick, (jnp.zeros(r, bool),), jnp.arange(c * top_k))

    # --- 2. max-IoU seed per ROI -------------------------------------------
    iou_to_seeds = jnp.where(seed_ok[None, :], iou[:, seed_n], -jnp.inf)
    best = jnp.argmax(iou_to_seeds, axis=1)          # (R,)
    max_iou = jnp.max(iou_to_seeds, axis=1)
    assign_c = seed_c[best].astype(jnp.int32)
    if class_weights is not None:
        assign_w = jnp.asarray(class_weights, jnp.float32)[assign_c]
    else:
        assign_w = seed_p[best]

    # --- 3. random-order sampling caps (closed form) -----------------------
    perm = jax.random.permutation(rng, r)
    inv = jnp.zeros(r, jnp.int32).at[perm].set(jnp.arange(r, dtype=jnp.int32))
    fg_cand = valid & (max_iou >= fg_thresh)
    bg_cand = valid & ~fg_cand & (max_iou >= bg_thresh_lo) & (max_iou < bg_thresh_hi)
    fg_rank = jnp.cumsum(fg_cand[perm].astype(jnp.int32))[inv]  # 1-based
    bg_rank = jnp.cumsum(bg_cand[perm].astype(jnp.int32))[inv]
    fg = fg_cand & (fg_rank <= num_pos + 1)   # kernel checks cap pre-increment
    bg = bg_cand & (bg_rank <= num_neg + 1)

    rl = jnp.where(bg, c, assign_c).astype(jnp.int32)
    rw = jnp.where(fg | bg, assign_w, 0.0)
    rw = jnp.where(valid, rw, 0.0)
    return rl, rw
