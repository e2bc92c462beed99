"""WS-ResNet: the WSOD-flavoured ResNet used by the WSL project.

Parity target: uwsod/projects/WSL/wsl/modeling/backbone/resnet_ws.py
(:369-731, build_ws_resnet_backbone). Differences from stock detectron2
ResNet, all reproduced here:
 - deep 3x3 stem: three 3x3 convs (first stride 2) + maxpool2 (:369-430);
 - residual blocks NEVER stride (:155-157 forces stride=1); downsampling is
   a trailing 2x2 maxpool attached to the LAST block of res2/res3
   ("stride_per_block"/"has_pool_per_block" = last-block-only, :694-699);
   when the pool stride is 1 the input is edge-padded so shape is kept;
 - with RES5_DILATION=2 both res4 and res5 are dilated and stride-free, so
   the network is stride 8 end to end (:690-692), matching the dilated
   VGG16; with RES5_DILATION=1 res3's trailing pool strides by 2 and
   res4/res5 are stride-16 undilated;
 - frozen BN everywhere (caffe-converted weights).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import FrozenBN, _DEPTH_BLOCKS, _conv_init


class WSBasicStem(nn.Module):
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, stride in enumerate((2, 1, 1), start=1):
            x = nn.Conv(self.out_channels, (3, 3), strides=stride, padding=1,
                        use_bias=False, dtype=self.dtype,
                        kernel_init=_conv_init, name=f"conv{i}")(x)
            x = FrozenBN(self.out_channels, name=f"conv{i}_norm")(x)
            x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class WSBottleneckBlock(nn.Module):
    """Stride-free bottleneck with an optional trailing maxpool
    (resnet_ws.py:121-252)."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    dilation: int = 1
    has_pool: bool = False
    pool_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init,
                      name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3),
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, dtype=self.dtype, kernel_init=_conv_init,
                      name="conv2")(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init,
                      name="conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)
        if self.in_channels != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                         dtype=self.dtype, kernel_init=_conv_init,
                         name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        out = nn.relu(out + sc)
        if self.has_pool:
            if self.pool_stride == 1:
                # keep spatial size: pad right/bottom then 2x2 pool stride 1
                pad = [(0, 0)] * (out.ndim - 3) + [(0, 1), (0, 1), (0, 0)]
                out = jnp.pad(out, pad, mode="edge")
                out = nn.max_pool(out, (2, 2), strides=(1, 1))
            else:
                out = nn.max_pool(out, (2, 2),
                                  strides=(self.pool_stride,) * 2)
        return out


class DeformBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv is a (modulated) deformable conv.

    Parity target: DeformBottleneckBlock (resnet_ws.py:252-368 and stock d2
    modeling/backbone/resnet.py): a conv2_offset 3x3 conv predicts 18 offset
    channels (+9 modulation channels when ``deform_modulated``, passed
    through sigmoid); conv2 becomes ops/deform_conv.deform_conv2d.
    Offset conv is zero-initialised (the reference's nn.init.constant_(0))
    so training starts as a plain bottleneck. Stride-free WS variant."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    dilation: int = 1
    deform_modulated: bool = False
    has_pool: bool = False
    pool_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ...ops.deform_conv import deform_conv2d

        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init,
                      name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)

        off_ch = 27 if self.deform_modulated else 18
        off = nn.Conv(off_ch, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="conv2_offset")(out)
        if self.deform_modulated:
            o1, o2, m = jnp.split(off, [9, 18], axis=-1)
            # our deform_conv2d takes (dy, dx) interleaved per tap; porting
            # d2 deform weights would need a channel permutation here
            offset = jnp.stack([o1, o2], axis=-1).reshape(off.shape[:-1] + (18,))
            mask = jax.nn.sigmoid(m)
        else:
            offset = off.reshape(off.shape[:-1] + (18,))
            mask = None
        w2 = self.param("conv2_kernel", _conv_init,
                        (3, 3, self.bottleneck_channels,
                         self.bottleneck_channels), self.dtype)

        def dc(feat_hwc, off_hwc, mask_hwc):
            return deform_conv2d(feat_hwc, off_hwc, w2, mask_hwc,
                                 stride=1, padding=self.dilation,
                                 dilation=self.dilation)

        if out.ndim == 4:
            if mask is None:
                out = jax.vmap(lambda f, o: dc(f, o, None))(out, offset)
            else:
                out = jax.vmap(dc)(out, offset, mask)
        else:
            out = dc(out, offset, mask)
        out = FrozenBN(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)

        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init,
                      name="conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)
        if self.in_channels != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                         dtype=self.dtype, kernel_init=_conv_init,
                         name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        out = nn.relu(out + sc)
        if self.has_pool:
            if self.pool_stride == 1:
                pad = [(0, 0)] * (out.ndim - 3) + [(0, 1), (0, 1), (0, 0)]
                out = jnp.pad(out, pad, mode="edge")
                out = nn.max_pool(out, (2, 2), strides=(1, 1))
            else:
                out = nn.max_pool(out, (2, 2),
                                  strides=(self.pool_stride,) * 2)
        return out


class WSResNet(nn.Module):
    """Returns dict of requested stage outputs {'res2': ..., 'res5': ...}."""

    depth: int = 50
    freeze_at: int = 2
    out_features: Sequence[str] = ("res5",)
    res5_dilation: int = 2
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        if self.res5_dilation == 2:
            return {"stem": 4, "res2": 8, "res3": 8, "res4": 8, "res5": 8}
        return {"stem": 4, "res2": 8, "res3": 16, "res4": 16, "res5": 16}

    @property
    def out_feature_channels(self) -> Dict[str, int]:
        c = self.res2_out_channels
        return {"res2": c, "res3": 2 * c, "res4": 4 * c, "res5": 8 * c}

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        blocks_per_stage = _DEPTH_BLOCKS[self.depth]
        x = WSBasicStem(self.stem_out_channels, self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs: Dict[str, jnp.ndarray] = {}
        in_ch = self.stem_out_channels
        out_ch = self.res2_out_channels
        bott_ch = self.width_per_group
        for stage_idx, n_blocks in enumerate(blocks_per_stage, start=2):
            name = f"res{stage_idx}"
            dilation = self.res5_dilation if stage_idx in (4, 5) else 1
            if stage_idx == 2:
                last_pool, pool_stride = True, 2
            elif stage_idx == 3:
                last_pool = True
                pool_stride = 2 if self.res5_dilation == 1 else 1
            else:
                last_pool, pool_stride = False, 1
            for b in range(n_blocks):
                x = WSBottleneckBlock(
                    in_channels=in_ch if b == 0 else out_ch,
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    dilation=dilation,
                    has_pool=last_pool and b == n_blocks - 1,
                    pool_stride=pool_stride,
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


def build_ws_resnet(cfg, out_features=None, dtype=jnp.float32):
    return WSResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        out_features=tuple(out_features or cfg.MODEL.RESNETS.OUT_FEATURES),
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        dtype=dtype,
    )
