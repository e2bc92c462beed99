"""ContextLocNet ROI head (contrastive-S model).

Parity targets:
 - ContextLocNetROIHeads (reference: uwsod/projects/WSL/wsl/modeling/
   roi_heads/roi_heads_contextlocnet.py:29-384): requires the ROILoopPool
   pooler (3 stacked regions per ROI: box, inner frame, outer context);
   objectness weights are tiled x3 (:286-290); the DAN box head runs over
   all 3P rows, then the WSDDN predictor is called with ``context=True``;
 - forward_contextlocnet (fast_rcnn_wsddn.py:591-609): classification
   stream C = cls(x_box); detection stream D = det(x_frame) - det(x_context)
   (the contrastive context term); scores/losses are plain WSDDN MIL.

The pooled input is the NHWC analog of the reference's 3P-stacked ROILoopPool
output (ops/roi_loop_pool.py). Both Dense streams run over the full 3P rows
in one matmul — slicing afterwards — which keeps the MXU matmul large.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .dan import DAN
from .wsddn import WSDDNHead, mil_loss, wsddn_scores


class ContextLocNetROIHead(nn.Module):
    """DAN + contrastive WSDDN over [box; frame; context] ROI triples."""

    num_classes: int = 20
    mean_loss: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DAN(fc_dims=tuple(self.dan_dims), dtype=self.dtype)
        self.wsddn = WSDDNHead(self.num_classes, dtype=self.dtype)

    def _scores(self, pooled3, objectness, prop_valid, train):
        """pooled3: (3P, h, w, ch) stacked [box; frame; context]."""
        p = pooled3.shape[0] // 3
        w = jnp.tile(objectness + 1.0, 3).astype(pooled3.dtype)
        feats = self.dan(pooled3 * w[:, None, None, None], train=train)
        c_all, d_all = self.wsddn(feats)
        c = c_all[:p]
        d = d_all[p:2 * p] - d_all[2 * p:]
        return wsddn_scores(c, d, prop_valid)

    def losses(self, pooled3, objectness, prop_valid, gt_classes_oh
               ) -> Dict[str, jnp.ndarray]:
        scores = self._scores(pooled3, objectness, prop_valid, train=True)
        return {"loss_cls": mil_loss(scores, gt_classes_oh, self.mean_loss)}

    def predict(self, pooled3, boxes, objectness, prop_valid
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scores = self._scores(pooled3, objectness, prop_valid, train=False)
        scores = jnp.concatenate(
            [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1)
        return scores, boxes
