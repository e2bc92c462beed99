"""VGG16 backbone (WSOD flavor): 5 plain conv stages, dilated conv5.

Parity target: reference VGG16 (uwsod/projects/WSL/wsl/modeling/backbone/vgg.py:13-246):
  plain1: 2 convs 3x3/64,  maxpool 2x2 s2        -> stride 2
  plain2: 2 convs 3x3/128, maxpool 2x2 s2        -> stride 4
  plain3: 3 convs 3x3/256, maxpool 2x2 s2        -> stride 8
  plain4: 3 convs 3x3/512, maxpool 2x2 s1 when conv5_dilation==2 (stride stays 8)
  plain5: 3 convs 3x3/512 dilation=2, no pool    -> out 'plain5', 512ch, stride 8
freeze_at=2 freezes plain1+plain2 (handled by stop_gradient at the boundary plus
an optimizer trainable-mask; see solver.build).

TPU-native: NHWC layout, optional bf16 compute, and optional padded-region
masking — when images are padded to bucketed shapes for jit-cache reuse, the
features beyond each stage's valid extent are zeroed so border features match
an exact-shape run up to the conv zero-padding convention.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# c2_msra_fill: kaiming normal, fan_out, relu
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PlainStage(nn.Module):
    out_channels: int
    num_conv: int
    dilation: int = 1
    pool_stride: int = 0  # 0 = no pool; else 2x2 maxpool with this stride
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_conv):
            x = nn.Conv(
                self.out_channels,
                (3, 3),
                padding=self.dilation,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=True,
                dtype=self.dtype,
                kernel_init=_conv_init,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        if self.pool_stride:
            x = nn.max_pool(x, (2, 2), strides=(self.pool_stride, self.pool_stride), padding="VALID")
        return x


def _stage_valid(valid_hw: jnp.ndarray, pool_stride: int) -> jnp.ndarray:
    """Valid extent after a stage: convs preserve size; 2x2 pool maps
    H -> floor((H-2)/s)+1 for the padded canvas, and the *valid* region follows
    the same formula."""
    if pool_stride:
        return jnp.maximum((valid_hw - 2) // pool_stride + 1, 1)
    return valid_hw


def _mask_padding(x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """Zero features at/beyond the valid (h, w) extent. valid_hw: (N, 2) int32."""
    n, h, w, _ = x.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    m = (rows < valid_hw[:, 0, None, None]) & (cols < valid_hw[:, 1, None, None])
    return x * m[..., None].astype(x.dtype)


class VGG16(nn.Module):
    """Returns a dict of requested stage outputs, like d2 Backbone.forward."""

    conv5_dilation: int = 2
    freeze_at: int = 2
    out_features: Sequence[str] = ("plain5",)
    dtype: Any = jnp.float32

    # (name, channels, num_conv, dilation_flag, pool)
    @property
    def out_feature_strides(self):
        s45 = 8 if self.conv5_dilation == 2 else 16
        return {"plain1": 2, "plain2": 4, "plain3": 8, "plain4": s45, "plain5": s45}

    @property
    def out_feature_channels(self):
        return {"plain1": 64, "plain2": 128, "plain3": 256, "plain4": 512, "plain5": 512}

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid_hw: Optional[jnp.ndarray] = None
    ) -> dict:
        """x: (N, H, W, 3) BGR mean-subtracted. valid_hw: (N, 2) true extents."""
        p4_pool = 1 if self.conv5_dilation == 2 else 2
        stages = [
            ("plain1", PlainStage(64, 2, 1, 2, self.dtype)),
            ("plain2", PlainStage(128, 2, 1, 2, self.dtype)),
            ("plain3", PlainStage(256, 3, 1, 2, self.dtype)),
            ("plain4", PlainStage(512, 3, 1, p4_pool, self.dtype)),
            ("plain5", PlainStage(512, 3, self.conv5_dilation, 0, self.dtype)),
        ]
        outputs = {}
        v = valid_hw
        for i, (name, stage_def) in enumerate(stages, start=1):
            x = PlainStage(
                stage_def.out_channels,
                stage_def.num_conv,
                stage_def.dilation,
                stage_def.pool_stride,
                self.dtype,
                name=name,
            )(x)
            if v is not None:
                v = _stage_valid(v, stage_def.pool_stride)
                x = _mask_padding(x, v)
            if i == self.freeze_at:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs


def frozen_param_labels(params: dict, freeze_at: int) -> dict:
    """Label pytree for the optimizer: 'frozen' for plain1..plain{freeze_at}."""
    frozen_names = {f"plain{i}" for i in range(1, freeze_at + 1)}

    def label(path_name):
        return "frozen" if path_name in frozen_names else "trainable"

    return {k: jax.tree_util.tree_map(lambda _: label(k), v) for k, v in params.items()}
