"""DiscriminativeAdaptionNeck (DAN) box head.

Parity target: reference DAN (uwsod/projects/WSL/wsl/modeling/roi_heads/box_head.py:15-104):
N conv 3x3 (none in the OICR+ config) then FC(4096)->ReLU->Dropout(0.5) x2.
FC init: normal(std=0.005), bias 0.1 (box_head.py:62-67).
Input is (P, C, PH, PW) pooled features — flattened in C-major order so
converted torch/caffe FC weights apply unchanged.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.dropout import HwDropout

_fc_init = nn.initializers.normal(stddev=0.005)
_bias_init = nn.initializers.constant(0.1)
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DAN(nn.Module):
    conv_dims: Sequence[int] = ()
    fc_dims: Sequence[int] = (4096, 4096)
    dropout_rate: float = 0.5
    # channels_last: input is (P, PH, PW, C), flattened in (h, w, c) order —
    # no transpose copies on the hot path; converted torch fc1 weights are
    # row-permuted accordingly at load time (engine/weights.py:_fc6_w).
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        """x: (P, C, PH, PW) (default) or (P, PH, PW, C) -> (P, fc_dims[-1])."""
        if self.conv_dims:
            if not self.channels_last:
                x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for convs
            for i, d in enumerate(self.conv_dims):
                x = nn.Conv(d, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=_conv_init, name=f"conv{i + 1}")(x)
                x = nn.relu(x)
            if not self.channels_last:
                x = jnp.transpose(x, (0, 3, 1, 2))
        x = x.reshape(x.shape[0], -1)
        for i, d in enumerate(self.fc_dims):
            x = nn.Dense(d, dtype=self.dtype, kernel_init=_fc_init,
                         bias_init=_bias_init, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
            # ops/dropout.py: bernoulli-mask dropout falls off an XLA fusion
            # cliff in this stack's backward (~10x); HwDropout stays at peak
            x = HwDropout(self.dropout_rate)(x, deterministic=not train)
        return x
