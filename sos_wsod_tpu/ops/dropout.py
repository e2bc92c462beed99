"""Dropout formulated for the TPU backward pass.

Parity target: torch ``nn.Dropout`` as used by the reference DAN box head
(uwsod/projects/WSL/wsl/modeling/roi_heads/box_head.py:62-75) — train-time
``x * mask / keep``, identity at eval. Bit-exact mask reproduction is not a
parity requirement (training-only randomness).

Why not ``flax.linen.Dropout``: its ``jax.random.bernoulli`` mask lowers to a
uniform-from-bits construction (bitcast + float compare) that XLA freely
rematerializes into the *backward* matmul fusions. Measured on v5e at stage-1
production shapes ((16384, 25088)->4096->4096 fc stack, fwd+bwd+update): the
bernoulli formulations fall off a fusion cliff to ~21 TF/s (~540 ms) while the
dropout-free stack runs at ~215 TF/s (~55 ms). Two formulations stay at peak
(~54 ms, tools/bench_dan_bwd.py + BASELINE.md round-4 notes):

  * mask from ``jax.random.bits`` (uint8 threshold compare, no float uniform)
  * mask multiplied through a ``custom_vjp`` that SAVES the mask as a
    residual, so the backward consumes a plain array instead of re-running
    the RNG inside a matmul fusion.

``hw_dropout`` combines both. The keep probability is quantized to 1/256
(uint8 threshold); the production rate 0.5 is exact (threshold 128).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def _masked_scale(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return x * mask


def _masked_scale_fwd(x, mask):
    # the mask (not x) is the residual: bwd is dy * mask, never re-runs RNG
    return x * mask, mask


def _masked_scale_bwd(mask, dy):
    return dy * mask, None


_masked_scale.defvjp(_masked_scale_fwd, _masked_scale_bwd)


def hw_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """Train-mode dropout: zero with probability ``rate``, scale kept values
    by 1/keep. Keep probability is quantized to 1/256 (exact at rate=0.5).

    Reverse-mode only: the saved-mask ``custom_vjp`` has no JVP rule, so
    ``jax.jvp``/``jacfwd`` through this op raises — use ``flax.linen.Dropout``
    if forward-mode AD is ever needed.

    Rates whose keep probability is not a multiple of 1/256 are rounded to the
    nearest (and clamped to [1/256, 255/256]); if that moves the keep
    probability by more than 1/512 — e.g. rate=0.001 would silently quadruple
    to an effective 1/256 — raise instead of training a different model than
    configured.
    """
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    thresh = max(1, min(255, round(keep * 256)))
    if abs(thresh / 256.0 - keep) > 1.0 / 512.0:
        raise ValueError(
            f"hw_dropout rate={rate} quantizes to effective keep "
            f"{thresh}/256={thresh / 256.0:.6f} (configured keep {keep:.6f}); "
            "use flax.linen.Dropout for rates this far off the 1/256 grid")
    bits = jax.random.bits(key, x.shape, jnp.uint8)
    scale = jnp.asarray(256.0 / thresh, x.dtype)  # 1/quantized-keep
    mask = jnp.where(bits < thresh, scale, jnp.zeros_like(scale))
    return _masked_scale(x, mask)


class HwDropout(nn.Module):
    """Drop-in for ``flax.linen.Dropout`` (rng collection ``'dropout'``) using
    the peak-rate formulation above. Use on hot paths feeding matmuls.
    Reverse-mode AD only (see ``hw_dropout``); rate must sit within 1/512 of
    the 1/256 keep-probability grid (0.5 is exact)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate <= 0.0:
            return x
        return hw_dropout(x, self.make_rng("dropout"), self.rate)
