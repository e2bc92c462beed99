"""Feature Pyramid Network over ResNet stages.

Parity target: detectron2 FPN (reference: detectron2/detectron2/modeling/
backbone/fpn.py — lateral 1x1 + output 3x3 convs, top-down nearest-2x upsample,
sum fuse, LastLevelMaxPool p6). TPU-native: NHWC; upsampling via
jnp.repeat (nearest, exact d2 semantics for 2x).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

# d2 FPN convs use c2_xavier_fill (uniform fan_in)
_xavier_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class FPN(nn.Module):
    """Builds p-levels from bottom-up features.

    in_features: bottom-up names low->high resolution order, e.g.
    ("res2", "res3", "res4", "res5") with strides (4, 8, 16, 32).
    Outputs {"p2".."p5"} plus "p6" from max-pooling p5 (top_block).
    """

    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    in_strides: Sequence[int] = (4, 8, 16, 32)
    out_channels: int = 256
    fuse_type: str = "sum"
    top_block: bool = True  # LastLevelMaxPool -> p6
    dtype: Any = jnp.float32

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        out = {f"p{i + 2}": s for i, s in enumerate(self.in_strides)}
        if self.top_block:
            out[f"p{len(self.in_strides) + 2}"] = self.in_strides[-1] * 2
        return out

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = [bottom_up[f] for f in self.in_features]  # low->high res order
        n = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=_xavier_init, name=f"fpn_lateral{i + 2}")(feats[i])
            for i in range(n)
        ]
        # top-down pathway
        merged = [None] * n
        merged[n - 1] = laterals[n - 1]
        for i in range(n - 2, -1, -1):
            up = merged[i + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)  # nearest 2x
            # crop in case of odd sizes (d2 uses interpolate to exact shape)
            up = up[..., : laterals[i].shape[-3], : laterals[i].shape[-2], :]
            merged[i] = laterals[i] + up
            if self.fuse_type == "avg":
                merged[i] = merged[i] / 2.0
        outputs = {}
        for i in range(n):
            outputs[f"p{i + 2}"] = nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                kernel_init=_xavier_init, name=f"fpn_output{i + 2}",
            )(merged[i])
        if self.top_block:
            top = outputs[f"p{n + 1}"]
            outputs[f"p{n + 2}"] = nn.max_pool(
                top, (1, 1), strides=(2, 2), padding="VALID"
            )
        return outputs


class ResNetFPN(nn.Module):
    """ResNet + FPN composite backbone (build_resnet_fpn_backbone equivalent)."""

    depth: int = 50
    freeze_at: int = 2
    out_channels: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        from .resnet import ResNet

        self.bottom_up = ResNet(
            depth=self.depth,
            freeze_at=self.freeze_at,
            out_features=("res2", "res3", "res4", "res5"),
            dtype=self.dtype,
        )
        self.fpn = FPN(out_channels=self.out_channels, dtype=self.dtype)

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        return {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.fpn(self.bottom_up(x))
