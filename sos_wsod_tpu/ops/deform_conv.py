"""Deformable convolution (v1) and modulated deformable convolution (v2).

Parity target: detectron2's DeformConv/ModulatedDeformConv CUDA kernels
(reference: uwsod/detectron2/layers/csrc/deformable/deform_conv_cuda.cu,
consumed by DeformBottleneckBlock in resnet_ws.py:252-368 and stock d2
ResNet). Semantics per output location p and kernel tap k:

    y[p, co] = sum_k sum_ci w[k, ci, co] * m_k(p) * x(p*stride + k*dilation
                                                     - pad + off_k(p))[ci]

with bilinear sampling of x at fractional positions (zeros outside), offsets
off_k (and modulation m_k for v2) predicted per location by a side conv.

TPU-native: sampling is expressed as 4 batched gathers over the flattened
feature map (one per bilinear corner) for all H*W*K taps at once, and the
kernel contraction is ONE (H*W, K*Ci) x (K*Ci, Co) matmul on the MXU — the
im2col formulation of the CUDA kernel, without the per-sample scalar loops.
Everything is differentiable by autodiff (the reference implements its
backward by hand).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def deform_conv2d(
    x: jnp.ndarray,            # (H, W, Ci)
    offset: jnp.ndarray,       # (Ho, Wo, 2*Kh*Kw) — (dy, dx) per tap
    weight: jnp.ndarray,       # (Kh, Kw, Ci, Co)
    mask: Optional[jnp.ndarray] = None,  # (Ho, Wo, Kh*Kw) modulation (v2)
    bias: Optional[jnp.ndarray] = None,  # (Co,)
    *,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Returns (Ho, Wo, Co) with Ho = (H + 2p - d*(Kh-1) - 1)//s + 1."""
    h, w, ci = x.shape
    kh, kw, _, co = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (ho, wo, 2 * k), (offset.shape, (ho, wo, 2 * k))

    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None] + jnp.repeat(ky, kw)[None, None, :]  # (Ho,1,K)
    base_x = ox[None, :, None] + jnp.tile(kx, kh)[None, None, :]    # (1,Wo,K)
    off = jnp.asarray(offset, jnp.float32).reshape(ho, wo, k, 2)
    sy = base_y + off[..., 0]                                    # (Ho,Wo,K)
    sx = base_x + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0
    flat = x.reshape(h * w, ci)

    def corner(yc, xc):
        iy = yc.astype(jnp.int32)
        ix = xc.astype(jnp.int32)
        inside = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.where(inside, iy * w + ix, 0)
        vals = jnp.take(flat, idx, axis=0)                      # (Ho,Wo,K,Ci)
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wy1 = wy1[..., None]
    wx1 = wx1[..., None]
    sampled = (v00 * (1 - wy1) * (1 - wx1) + v01 * (1 - wy1) * wx1
               + v10 * wy1 * (1 - wx1) + v11 * wy1 * wx1)       # (Ho,Wo,K,Ci)
    if mask is not None:
        sampled = sampled * mask[..., None]

    out = sampled.reshape(ho * wo, k * ci) @ weight.reshape(k * ci, co)
    out = out.reshape(ho, wo, co)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
