"""Balanced positive/negative subsampling as fixed-shape masked ops.

Parity target: detectron2 ``subsample_labels`` (reference:
detectron2/detectron2/modeling/sampling.py:9-54): take up to
num_samples*positive_fraction positives (random subset), fill the rest with
random negatives. Dynamic counts become rank-against-budget comparisons: each
candidate gets a random priority, is ranked within its class, and is kept if
its rank is below the (data-dependent but scalar) budget — one sort, no
dynamic shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _rank_among(mask: jnp.ndarray, priority: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each True element of ``mask`` among masked elements,
    ordered by descending priority. False elements get a huge rank."""
    n = mask.shape[0]
    key = jnp.where(mask, priority, -jnp.inf)
    order = jnp.argsort(-key)  # indices sorted by priority desc
    ranks = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, ranks, n)


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """labels: (N,) int with -1 = ignore, 0 = negative, >0 ... wait d2 convention:
    label == -1 ignore, 0 negative/background, 1 positive (RPN) or class ids with
    bg marker handled by caller. Here: pos_mask_in = labels == 1 for RPN-style
    callers; ROI callers pass explicit masks via subsample_masks.

    Returns (pos_keep, neg_keep) bool masks with
    |pos_keep| = min(num_samples * positive_fraction, #pos) and
    |neg_keep| = min(num_samples - |pos_keep|, #neg).
    """
    return subsample_masks(labels == 1, labels == 0, num_samples, positive_fraction, rng)


def subsample_masks(
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k_pos, k_neg = jax.random.split(rng)
    pri_pos = jax.random.uniform(k_pos, pos_mask.shape)
    pri_neg = jax.random.uniform(k_neg, neg_mask.shape)

    num_pos_budget = int(num_samples * positive_fraction)
    n_pos = jnp.sum(pos_mask.astype(jnp.int32))
    pos_budget = jnp.minimum(num_pos_budget, n_pos)
    pos_rank = _rank_among(pos_mask, pri_pos)
    pos_keep = pos_mask & (pos_rank < pos_budget)

    n_neg = jnp.sum(neg_mask.astype(jnp.int32))
    neg_budget = jnp.minimum(num_samples - pos_budget, n_neg)
    neg_rank = _rank_among(neg_mask, pri_neg)
    neg_keep = neg_mask & (neg_rank < neg_budget)
    return pos_keep, neg_keep
