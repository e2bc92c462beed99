"""ops/dropout.py: hardware-rate dropout (bits-threshold mask + saved-mask VJP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sos_wsod_tpu.ops.dropout import HwDropout, hw_dropout


def test_rate_zero_and_deterministic_are_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    key = jax.random.key(0)
    assert np.array_equal(hw_dropout(x, key, 0.0), x)
    mod = HwDropout(0.5)
    y = mod.apply({}, x, deterministic=True)
    assert np.array_equal(y, x)


def test_rate_one_zeroes():
    x = jnp.ones((4, 4))
    assert np.array_equal(hw_dropout(x, jax.random.key(0), 1.0), np.zeros((4, 4)))


@pytest.mark.parametrize("rate", [0.25, 0.5])
def test_mask_statistics_and_scale(rate):
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(hw_dropout(x, jax.random.key(3), rate))
    zero_frac = float((y == 0).mean())
    assert zero_frac == pytest.approx(rate, abs=0.01)
    kept = y[y != 0]
    # kept values scaled by 1/quantized-keep; expectation preserved
    keep_q = round((1 - rate) * 256) / 256.0
    assert kept[0] == pytest.approx(1.0 / keep_q, rel=1e-6)
    assert float(y.mean()) == pytest.approx(1.0, abs=0.02)


def test_backward_routes_through_the_forward_mask():
    # d/dx sum(dropout(x)) must equal the exact mask used in the forward —
    # the custom VJP saves it, so grad * x == output elementwise
    x = jnp.asarray(np.random.RandomState(0).randn(64, 64) + 3.0, jnp.float32)
    key = jax.random.key(7)
    y, vjp = jax.vjp(lambda x: hw_dropout(x, key, 0.5), x)
    (gx,) = vjp(jnp.ones_like(y))
    np.testing.assert_allclose(np.asarray(gx) * np.asarray(x), np.asarray(y),
                               rtol=1e-6)


def test_module_uses_dropout_rng_collection():
    mod = HwDropout(0.5)
    x = jnp.ones((32, 32))
    y1 = mod.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(1)})
    y2 = mod.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(2)})
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))
    # same key -> same mask
    y1b = mod.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.key(1)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
