"""ASPP semantic-segmentation head (WSJDS segmentation branch).

Parity targets (uwsod/projects/WSL/wsl/modeling/seg_heads/seg_heads.py):
 - ASPPBranch (:18-77): 3x3 conv with dilation d + dropout(0.5), then 1x1
   conv stages per ASSP_CONVS_DIM, then a 1x1 predictor; msra (He) init;
 - ASPPHead (:79-171): max-pool(3, s1) on the input feature, four branches
   with dilations [6, 12, 18, 24] SUMMED; training loss is per-class binary
   CE with logits against {0,1,ignore} targets and per-pixel weights (sum
   reduction, NaNs zeroed, :127-140);
 - the optional CRF consistency constraint (:141-151, :173-229): bg/fg
   probabilities refined with denseCRF; loss = sum over pixels of
   KL(x_crf || sigmoid(sigmoid(x))) * weights_crf with entries > 1000 zeroed
   (the double sigmoid is faithful to the reference);
 - target/weight construction from CRF output (:206-229): pos where
   crf_fg >= 0.5, weights 1/#pos and 1/#neg, ignore weight 0.

The CRF itself is our native C++ op (ops/dense_crf.py), reached through
``jax.pure_callback`` so the surrounding computation stays jitted.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class ASPPBranch(nn.Module):
    dilation: int
    conv_dims: Sequence[int] = (1024, 1024)
    num_out: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (H, W, C) -> (H, W, num_out) logits."""
        for k, dim in enumerate(self.conv_dims):
            ksize = (3, 3) if k == 0 else (1, 1)
            dil = (self.dilation, self.dilation) if k == 0 else (1, 1)
            x = nn.Conv(dim, ksize, kernel_dilation=dil, padding="SAME",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"conv{k + 1}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Conv(self.num_out, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal(),
                       name="predictor")(x)


class ASPPHead(nn.Module):
    num_classes: int = 20
    conv_dims: Sequence[int] = (1024, 1024)
    mask_softmax: bool = False
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        """features: (H, W, C) -> summed branch logits (H, W, K[+1])."""
        x = nn.max_pool(features[None], (3, 3), strides=(1, 1),
                        padding="SAME")[0]
        num_out = self.num_classes + 1 if self.mask_softmax else self.num_classes
        out = None
        for d in self.dilations:
            b = ASPPBranch(d, tuple(self.conv_dims), num_out,
                           dtype=self.dtype, name=f"dilation{d}")(x, train)
            out = b if out is None else out + b
        return out


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(H, W, C) -> (h', w', C), align_corners=False semantics."""
    return jax.image.resize(x, (size[0], size[1], x.shape[-1]), "bilinear")


def sem_seg_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                 weights: jnp.ndarray, loss_weight: float = 1.0
                 ) -> jnp.ndarray:
    """Per-class weighted BCE-with-logits, sum reduction, NaNs zeroed
    (seg_heads.py:133-140). logits/targets/weights: (H, W, K)."""
    z = jnp.asarray(logits, jnp.float32)
    t = jnp.asarray(targets, jnp.float32)
    bce = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    loss = bce * weights * loss_weight
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return jnp.sum(loss)


def seg_targets_from_cpg(cpgs: jnp.ndarray, gt_classes_oh: jnp.ndarray,
                         preds_img: jnp.ndarray, *, tau: float = 0.7,
                         fg_threshold: float = 0.1,
                         bg_threshold: float = 0.005
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CPG -> seg {0,1,ignore} targets + balancing weights
    (wsjds_heads.py:652-677). cpgs: (K, H, W). Returns (targets, weights)
    both (K, H, W) with ignore already folded in (target 0, weight 0)."""
    pos = cpgs >= fg_threshold
    neg = cpgs < bg_threshold
    cls_ignore = (preds_img < tau)[:, None, None]
    cls_neg = (gt_classes_oh == 0)[:, None, None]
    # reference order: tau-ignore overrides cpg labels, but absent classes
    # are forced negative LAST (wsjds_heads.py:658-663)
    pos = pos & ~cls_ignore & ~cls_neg
    neg = (neg & ~cls_ignore) | cls_neg
    ignore = ~pos & ~neg

    npos = jnp.sum(pos, axis=(1, 2), keepdims=True).astype(jnp.float32)
    nneg = jnp.sum(neg, axis=(1, 2), keepdims=True).astype(jnp.float32)
    weights = jnp.where(pos, 1.0 / jnp.maximum(npos, 1.0),
                        jnp.where(neg, 1.0 / jnp.maximum(nneg, 1.0), 0.0))
    weights = jnp.where(ignore, 0.0, weights)
    targets = pos.astype(jnp.float32)
    return targets, weights


def crf_constraint(
    image: jnp.ndarray,          # (H, W, 3) de-normalised pixels (0..255)
    x_sigmoid: jnp.ndarray,      # (K, H, W) sigmoid mask probabilities
    *,
    fg_threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ASPPHead.crf (seg_heads.py:173-229): refine [bg; fg] with denseCRF,
    derive balancing weights from thresholded CRF foreground. Host callback
    with fixed shapes; returns (x_crf_fg (K, H, W), weights (K, H, W))."""
    from ...ops.dense_crf import dense_crf

    k, h, w = x_sigmoid.shape

    def host(img, fg):
        fg = np.asarray(fg, np.float32)
        bg = 1.0 - fg.max(axis=0, keepdims=True)
        bgfg = np.concatenate([bg, fg], axis=0)
        img_u8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        out = dense_crf(bgfg, np.moveaxis(img_u8, -1, 0))
        crf_fg = out[1:]
        # 1 pos / 0 neg / ignore (fg == bg threshold = 0.5 in the reference)
        pos = crf_fg >= fg_threshold
        neg = ~pos
        npos = pos.sum(axis=(1, 2), keepdims=True).astype(np.float32)
        nneg = neg.sum(axis=(1, 2), keepdims=True).astype(np.float32)
        weights = np.where(pos, 1.0 / np.maximum(npos, 1.0),
                           1.0 / np.maximum(nneg, 1.0)).astype(np.float32)
        return crf_fg.astype(np.float32), weights

    shapes = (jax.ShapeDtypeStruct((k, h, w), jnp.float32),
              jax.ShapeDtypeStruct((k, h, w), jnp.float32))
    return jax.pure_callback(host, shapes, jax.lax.stop_gradient(image),
                             jax.lax.stop_gradient(x_sigmoid))


def constraint_loss(x_sigmoid: jnp.ndarray, x_crf: jnp.ndarray,
                    weights_crf: jnp.ndarray) -> jnp.ndarray:
    """KL(x_crf || sigmoid(x_sigmoid)) * weights, entries > 1000 zeroed
    (seg_heads.py:141-151; the inner double sigmoid is the reference's)."""
    logq = jnp.log(jax.nn.sigmoid(jnp.asarray(x_sigmoid, jnp.float32)))
    p = jnp.asarray(x_crf, jnp.float32)
    kl = p * (jnp.log(jnp.maximum(p, 1e-20)) - logq)
    loss = kl * weights_crf
    loss = jnp.where(loss > 1000.0, 0.0, loss)
    return jnp.sum(loss)
