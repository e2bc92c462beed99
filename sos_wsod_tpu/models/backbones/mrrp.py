"""MRRP: Multi-Rate Receptive-field Pyramid (TridentNet-style) backbones.

Parity targets:
 - MRRPConv (reference: uwsod/projects/WSL/wsl/modeling/backbone/
   mrrp_conv.py:10-108): ONE shared weight applied to N parallel branches
   with per-branch dilation/padding; at test time either all branches run
   or only ``test_branch_idx``;
 - MRRPPlainBlock / MRRP VGG16 (vgg_mrrp.py:128-407): the VGG16 whose
   plain5 stage is replaced by a 3-conv MRRP block with branch dilations
   (default (1, 2, 3)), output concatenated over branches
   (``concat_output``, consumed by chunking in RPNWSL/UWSODROIHeads);
 - WS-ResNet-MRRP (resnet_ws_mrrp.py): same treatment of res4/res5 —
   covered by applying :class:`MRRPStage` over any single-branch trunk.

TPU design: branches are a leading axis (N_branch, H, W, C); the shared
kernel is applied per-branch with `jax.lax.conv_general_dilated` under a
Python loop (N_branch is 3 — unrolled, fused by XLA). Weight sharing is by
construction: one `self.param`.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .vgg import PlainStage


class MRRPConv(nn.Module):
    features: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        """xs: (N_branch, H, W, C) -> (N_branch, H, W, features), branch i
        convolved with dilation dilations[i] and SAME-preserving padding."""
        n, h, w, c = xs.shape
        assert n == len(self.dilations)
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.he_uniform(), (k, k, c, self.features),
            self.dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.dtype) if self.use_bias else None)
        outs = []
        for i, d in enumerate(self.dilations):
            pad = d * (k // 2)
            o = jax.lax.conv_general_dilated(
                xs[i][None].astype(self.dtype), kernel,
                window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            if bias is not None:
                o = o + bias
            outs.append(o)
        return jnp.stack(outs, axis=0)


class MRRPPlainStage(nn.Module):
    """num_conv x (MRRPConv + relu), optional trailing 2x2 maxpool
    (vgg_mrrp.py:128-253)."""

    features: int
    num_conv: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    has_pool: bool = False
    pool_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_conv):
            xs = MRRPConv(self.features, 3, tuple(self.dilations),
                          dtype=self.dtype, name=f"conv{i + 1}")(xs)
            xs = nn.relu(xs)
        if self.has_pool:
            xs = nn.max_pool(xs, (2, 2), strides=(self.pool_stride,) * 2)
        return xs


class MRRPVGG16(nn.Module):
    """VGG16 whose last stage is an MRRP pyramid. Output feature 'plain5'
    has a leading branch axis (N_branch, H/8, W/8, 512)."""

    freeze_at: int = 2
    num_branch: int = 3
    branch_dilations: Sequence[int] = (1, 2, 3)
    out_features: Sequence[str] = ("plain5",)
    dtype: Any = jnp.float32

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        return {"plain1": 2, "plain2": 4, "plain3": 8, "plain4": 8,
                "plain5": 8}

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid_hw: jnp.ndarray = None
                 ) -> Dict[str, jnp.ndarray]:
        """x: (N, H, W, 3). Returns {'plain5': (N, B, H/8, W/8, 512)}."""
        assert self.num_branch == len(self.branch_dilations)
        outputs: Dict[str, jnp.ndarray] = {}
        cfgs = [  # (features, num_conv, pool_stride) — vgg_mrrp.py:254-340
            ("plain1", 64, 2, 2),
            ("plain2", 128, 2, 2),
            ("plain3", 256, 3, 2),
            ("plain4", 512, 3, 1),   # dilated-C5 layout: stride stays 8
        ]
        for i, (name, feats, n_conv, pstride) in enumerate(cfgs, start=1):
            x = PlainStage(feats, n_conv, pool_stride=pstride,
                           dtype=self.dtype, name=name)(x)
            if self.freeze_at >= i:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x

        stage = MRRPPlainStage(512, 3, tuple(self.branch_dilations),
                               dtype=self.dtype, name="plain5")
        # per-image: stage maps (B, H, W, C) branches with one shared kernel
        out = jnp.stack([
            stage(jnp.broadcast_to(img[None], (self.num_branch,) + img.shape))
            for img in x
        ], axis=0)
        if self.freeze_at >= 5:
            out = jax.lax.stop_gradient(out)
        outputs["plain5"] = out
        return outputs
