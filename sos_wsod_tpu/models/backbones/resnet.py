"""ResNet backbone (R-50/R-101, FrozenBN) for the stage-2/3 detector.

Parity target: detectron2 ResNet (reference: detectron2/detectron2/modeling/
backbone/resnet.py — BasicStem, BottleneckBlock with stride_in_1x1, FrozenBN,
freeze_at semantics). TPU-native: NHWC layout, bf16 compute option, FrozenBN
folded into a scale+shift (it is inference-only affine in the reference too),
stage freezing via stop_gradient at stage boundaries + optimizer masks.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")  # c2_msra_fill


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics/affine: y = (x - mean) / sqrt(var+eps) *
    weight + bias. Parameters live in the param tree (loaded from pretrained
    weights) but receive no gradient (reference layers/batch_norm.py
    FrozenBatchNorm2d)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        scale = jax.lax.stop_gradient(scale)
        shift = jax.lax.stop_gradient(shift)
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class BasicStem(nn.Module):
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init, name="conv1")(x)
        x = FrozenBN(self.out_channels, name="conv1_norm")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class BottleneckBlock(nn.Module):
    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=s1, use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init, name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=s3,
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, dtype=self.dtype, kernel_init=_conv_init,
                      name="conv2")(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=_conv_init, name="conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)
        if self.in_channels != self.out_channels or self.stride != 1:
            sc = nn.Conv(self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                         dtype=self.dtype, kernel_init=_conv_init, name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


_DEPTH_BLOCKS = {
    14: (1, 1, 1, 1),  # test-only mini depth: 1 bottleneck per stage
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class ResNet(nn.Module):
    """Returns dict of requested stage outputs {'res2': ..., ...}."""

    depth: int = 50
    freeze_at: int = 2  # d2: 1 freezes stem, 2 freezes stem+res2, ...
    out_features: Sequence[str] = ("res4",)
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    width_per_group: int = 64
    num_groups: int = 1
    dtype: Any = jnp.float32

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        s = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}
        if self.res5_dilation == 2:
            s["res5"] = 16
        return s

    @property
    def out_feature_channels(self) -> Dict[str, int]:
        c = self.res2_out_channels
        return {"res2": c, "res3": 2 * c, "res4": 4 * c, "res5": 8 * c}

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        assert self.num_groups == 1, "group conv not needed by SoS configs"
        blocks_per_stage = _DEPTH_BLOCKS[self.depth]
        x = BasicStem(self.stem_out_channels, self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs: Dict[str, jnp.ndarray] = {}
        in_ch = self.stem_out_channels
        out_ch = self.res2_out_channels
        bott_ch = self.width_per_group
        for stage_idx, n_blocks in enumerate(blocks_per_stage, start=2):
            name = f"res{stage_idx}"
            first_stride = 1 if stage_idx == 2 else 2
            dilation = 1
            if stage_idx == 5 and self.res5_dilation == 2:
                first_stride = 1
                dilation = 2
            for b in range(n_blocks):
                x = BottleneckBlock(
                    in_channels=in_ch if b == 0 else out_ch,
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"{name}_block{b}",
                )(x)
            if self.freeze_at >= stage_idx:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            in_ch = out_ch
            out_ch *= 2
            bott_ch *= 2
        return outputs


def build_resnet(cfg, out_features: Optional[Sequence[str]] = None, dtype=jnp.float32):
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        out_features=tuple(out_features or cfg.MODEL.RESNETS.OUT_FEATURES),
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        dtype=dtype,
    )
