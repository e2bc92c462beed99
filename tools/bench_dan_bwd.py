"""Microbench: DAN fc stack fwd+bwd on the real TPU — where do 142 ms go?

The r4 device profile attributes ~72 ms fwd + ~70 ms bwd to the DAN fc stack
at stage-1 production shapes ((4*4096, 49*512) bf16 input), while the FLOP
floor (3.92 TFLOP fwd + 7.84 TFLOP bwd at ~197 TF/s bf16 peak) is ~60 ms.
This bench times the isolated stack and A/Bs the candidate causes:

  base      : flax Dense x2 + relu + dropout (the production module)
  nodrop    : dropout off (isolates RNG/mask cost)
  handdot   : hand-written fc1 with explicit dot_general and a custom wgrad
              formulation (dW^T = dy^T @ x, output transposed once) to probe
              whether XLA's default wgrad layout is the 2x-off-peak culprit
  bf16wgrad : wgrad computed bf16 -> cast f32 (probes accumulation dtype)

Timing pattern per verify skill: donated state-chained step, several
iterations, one device_get sync at the end.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
from sos_wsod_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()  # env vars are too late: jax pre-imports at startup
import jax.numpy as jnp
import numpy as np

N = 4 * 4096        # rows (4 views x 4096 proposals)
K = 49 * 512        # pooled feature width
F = 4096            # fc width
FLOPS_STEP = 2 * N * K * F * 3 + 2 * N * F * F * 3  # fwd + dgrad + wgrad, fc1+fc2


def run(name, loss_fn, params, x, iters=8):
    # donation consumes the buffers — give each A/B run its own copy so the
    # caller's params survive for the next variant
    params = jax.tree_util.tree_map(lambda a: jnp.array(a), params)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(params, x, key):
        # grad wrt params AND x (the real step needs d_pooled for the pool bwd)
        (l, _), g = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, x, key)
        # fold the grads back in so the chain can't be DCE'd; mimics SGD fusion
        new_p = jax.tree_util.tree_map(lambda p, d: p - 1e-6 * d, params, g[0])
        return new_p, jnp.sum(g[1][0, :8].astype(jnp.float32)) + l

    key = jax.random.key(0, impl="unsafe_rbg")
    params, s = step(params, x, key)
    jax.device_get(s)
    t0 = time.perf_counter()
    for i in range(iters):
        params, s = step(params, x, jax.random.fold_in(key, i))
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:8.2f} ms  {FLOPS_STEP/dt/1e12:7.1f} TF/s-equiv",
          flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, K), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(K, F) * 0.005, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.randn(F, F) * 0.005, jnp.float32)
    b2 = jnp.zeros((F,), jnp.float32)
    params = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    def fwd(params, x, key, drop=True):
        h = jnp.dot(x, params["w1"].astype(jnp.bfloat16)) + params["b1"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        if drop:
            k1, key = jax.random.split(key)
            h = h * jax.random.bernoulli(k1, 0.5, h.shape).astype(h.dtype) * 2.0
        h = jnp.dot(h, params["w2"].astype(jnp.bfloat16)) + params["b2"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        if drop:
            h = h * jax.random.bernoulli(key, 0.5, h.shape).astype(h.dtype) * 2.0
        return h

    def loss_base(params, x, key):
        h = fwd(params, x, key)
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    def loss_nodrop(params, x, key):
        h = fwd(params, x, key, drop=False)
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    # hand-written fc1 matmul with custom vjp: probe alternative wgrad layouts
    @jax.custom_vjp
    def fc(x, w):
        return jnp.dot(x, w.astype(jnp.bfloat16))

    def fc_fwd(x, w):
        return fc(x, w), (x, w)

    def fc_bwd(res, dy):
        x, w = res
        dx = jnp.dot(dy, w.astype(jnp.bfloat16).T)
        # wgrad via dot_general contracting the row dim of BOTH operands:
        # dy (N, F) x x (N, K) -> (F, K), then one (F, K) transpose — probes
        # whether giving XLA the swapped operand order changes its tiling
        dwT = jax.lax.dot_general(
            dy, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dx, dwT.T

    fc.defvjp(fc_fwd, fc_bwd)

    def loss_handdot(params, x, key):
        h = fc(x, params["w1"]) + params["b1"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        k1, key = jax.random.split(key)
        h = h * jax.random.bernoulli(k1, 0.5, h.shape).astype(h.dtype) * 2.0
        h = fc(h, params["w2"]) + params["b2"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = h * jax.random.bernoulli(key, 0.5, h.shape).astype(h.dtype) * 2.0
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    @jax.custom_vjp
    def fcb(x, w):
        return jnp.dot(x, w.astype(jnp.bfloat16))

    def fcb_fwd(x, w):
        return fcb(x, w), (x, w)

    def fcb_bwd(res, dy):
        x, w = res
        dx = jnp.dot(dy, w.astype(jnp.bfloat16).T)
        dw = jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16).astype(jnp.float32)
        return dx, dw

    fcb.defvjp(fcb_fwd, fcb_bwd)

    def loss_bf16wgrad(params, x, key):
        h = fcb(x, params["w1"]) + params["b1"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        k1, key = jax.random.split(key)
        h = h * jax.random.bernoulli(k1, 0.5, h.shape).astype(h.dtype) * 2.0
        h = fcb(h, params["w2"]) + params["b2"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = h * jax.random.bernoulli(key, 0.5, h.shape).astype(h.dtype) * 2.0
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    # the production dropout (ops/dropout.py hw_dropout: uint8-bits mask via
    # a saved-mask custom_vjp) — the variant the model actually runs
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sos_wsod_tpu.ops.dropout import hw_dropout

    def loss_hwdrop(params, x, key):
        h = jnp.dot(x, params["w1"].astype(jnp.bfloat16)) \
            + params["b1"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        k1, key = jax.random.split(key)
        h = hw_dropout(h, k1, 0.5)
        h = jnp.dot(h, params["w2"].astype(jnp.bfloat16)) \
            + params["b2"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = hw_dropout(h, key, 0.5)
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    # the actual flax module (DAN: Dense + HwDropout), params as the model
    # stores them — catches any module-level overhead the hand He loss hides
    from sos_wsod_tpu.models.heads.dan import DAN

    dan = DAN(fc_dims=(F, F), channels_last=True, dtype=jnp.bfloat16)
    rngd = jax.random.key(1, impl="unsafe_rbg")
    dan_params = dan.init({"params": jax.random.PRNGKey(0), "dropout": rngd},
                          x.reshape(N, 7, 7, 512), train=True)["params"]

    def loss_danmod(params, x, key):
        h = dan.apply({"params": params}, x.reshape(N, 7, 7, 512),
                      train=True, rngs={"dropout": key})
        return jnp.sum(h.astype(jnp.float32)) * 1e-6, None

    print(f"N={N} K={K} F={F}; per-step fwd+bwd FLOP = {FLOPS_STEP/1e12:.2f} T",
          flush=True)
    run("base", loss_base, params, x)
    run("nodrop", loss_nodrop, params, x)
    run("handdot", loss_handdot, params, x)
    run("bf16wgrad", loss_bf16wgrad, params, x)
    run("hwdrop", loss_hwdrop, params, x)
    run("danmod", loss_danmod, dan_params, x)


if __name__ == "__main__":
    main()
