"""Proposal<->GT matcher with masked (fixed-capacity) ground truth.

Parity target: detectron2 ``Matcher`` (reference:
uwsod/detectron2/modeling/matcher.py:8-140). Differences forced by XLA:
ground truth arrives as a fixed-capacity array plus validity mask instead of a
variable-length tensor. Invalid gt rows take quality -1 so they can never win
the argmax; when zero gt are valid every prediction gets quality -1 < any
threshold, reproducing torch's "no gt => label = labels[0]" branch
(matcher.py:86-97) for the standard configs where labels[0] corresponds to the
lowest band (background).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        assert len(labels) == len(thresholds) + 1
        assert all(l in (-1, 0, 1) for l in labels)
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args:
            match_quality_matrix: (M, N) quality (IoU), M = gt capacity, N preds.
            gt_valid: (M,) bool mask of real gt rows.
        Returns:
            matches: (N,) int32 best gt index per prediction (0 if no valid gt —
                torch returns 0 there too).
            match_labels: (N,) int8 in {-1, 0, 1} per self.labels bands.
        """
        q = jnp.where(gt_valid[:, None], match_quality_matrix, -1.0)
        matched_vals = q.max(axis=0)
        # torch .max returns the first max index on ties; jnp.argmax matches.
        matches = jnp.argmax(q, axis=0).astype(jnp.int32)

        match_labels = jnp.full(matches.shape, 1, dtype=jnp.int8)
        for (label, low, high) in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_band = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_band, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # For each valid gt, predictions tying its best quality become label 1
            # (matcher.py:115-140). Note d2's set_low_quality_matches_ has NO
            # quality>0 guard: a gt whose best IoU is 0 marks every zero-IoU
            # prediction as label 1 (known d2 quirk) — reproduced here.
            highest_per_gt = jnp.where(gt_valid, match_quality_matrix.max(axis=1), -1.0)
            is_best = (match_quality_matrix == highest_per_gt[:, None]) & gt_valid[:, None]
            pred_is_best = is_best.any(axis=0)
            match_labels = jnp.where(pred_is_best, jnp.int8(1), match_labels)
        return matches, match_labels
