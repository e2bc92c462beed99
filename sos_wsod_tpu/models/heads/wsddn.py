"""WSDDN MIL output layer.

Parity target: reference WSDDNOutputLayers/WSDDNOutputs
(uwsod/projects/WSL/wsl/modeling/roi_heads/fast_rcnn_wsddn.py:432-600,340-375):
  C = cls(x); D = det(x)                     (both Linear, xavier init, bias 0)
  scores = softmax(C, dim=1) * softmax(D, dim=0 per image)
  image_logits = clamp(sum_rois(scores), 1e-6, 1 - 1e-6)
  MIL loss = BCE(image_logits, one-hot labels), 'mean' reduction / batch(=1)

Masked fixed-capacity version: the proposal-axis softmax masks padded slots
with -inf; padded rows are zeroed in ``scores`` so image sums see only real
proposals.
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class LinearParams(nn.Module):
    """Declares a Dense layer's (kernel, bias) WITHOUT applying it.

    The WSOD output heads are many small-N Linears (N = 21/84) over the same
    (V*P, 4096) features; each pads its N to the 128-lane MXU tile, so ten
    separate matmuls waste most of the array. Consumers collect several
    heads' params and run ONE packed matmul (``packed_linear``). The
    parameter tree is identical to ``nn.Dense(name=...)`` — kernel/bias under
    the module scope — so checkpoints and torch-weight import are unaffected.
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.param("kernel", self.kernel_init,
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def packed_linear(x: jnp.ndarray, parts: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                  dtype: Any) -> List[jnp.ndarray]:
    """ONE matmul for several Dense heads: x @ concat(kernels) + concat(bias),
    split back into per-head outputs. Matches nn.Dense(dtype=...) compute
    semantics (inputs/params cast to ``dtype``, f32 params kept as master)."""
    kk = jnp.concatenate([k.astype(dtype) for k, _ in parts], axis=1)
    bb = jnp.concatenate([b.astype(dtype) for _, b in parts], axis=0)
    y = x.astype(dtype) @ kk + bb
    outs, off = [], 0
    for k, _ in parts:
        outs.append(y[:, off:off + k.shape[1]])
        off += k.shape[1]
    return outs


class WSDDNHead(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.cls = LinearParams(self.num_classes,
                                nn.initializers.xavier_uniform())
        self.det = LinearParams(self.num_classes,
                                nn.initializers.xavier_uniform())

    def parts(self, in_features: int):
        return [self.cls(in_features), self.det(in_features)]

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (P, F) -> raw (C, D) logits, each (P, K)."""
        c, d = packed_linear(x, self.parts(x.shape[-1]), self.dtype)
        return c, d


def wsddn_scores(c: jnp.ndarray, d: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(P,K),(P,K),(P,) -> (P,K) MIL proposal scores; padded rows are zero."""
    cls_sm = jnp.exp(jnp.asarray(c, jnp.float32) - jnp.max(c, axis=1, keepdims=True))
    cls_sm = cls_sm / jnp.sum(cls_sm, axis=1, keepdims=True)
    d32 = jnp.asarray(d, jnp.float32)
    d_masked = jnp.where(valid[:, None], d32, -jnp.inf)
    det_sm = jnp.exp(d_masked - jnp.max(d_masked, axis=0, keepdims=True))
    det_sm = jnp.where(valid[:, None], det_sm, 0.0)
    det_sm = det_sm / jnp.maximum(jnp.sum(det_sm, axis=0, keepdims=True), 1e-20)
    return jnp.where(valid[:, None], cls_sm * det_sm, 0.0)


def mil_image_scores(scores: jnp.ndarray) -> jnp.ndarray:
    """(P,K) -> (K,) clamped image-level class probabilities."""
    return jnp.clip(jnp.sum(scores, axis=0), 1e-6, 1.0 - 1e-6)


def mil_loss(scores: jnp.ndarray, gt_classes_oh: jnp.ndarray, mean_loss: bool = True) -> jnp.ndarray:
    """BCE between image-level scores and one-hot labels.

    mean_loss=True -> mean over classes (reference WSL.MEAN_LOSS); else sum.
    Both are divided by the image-batch dimension (1 per image here).
    """
    p = mil_image_scores(scores)
    t = gt_classes_oh.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return jnp.mean(bce) if mean_loss else jnp.sum(bce)
