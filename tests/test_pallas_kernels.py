"""Pallas fused-kernel correctness.

On the CPU test platform the kernels run in interpreter mode, asserting the
same bitwise parity with the scalar oracle that the jnp path satisfies.  On
real TPU hardware the compiled kernels are exercised by bench.py and by
tests/tpu/test_on_tpu.py (run manually: JAX_PLATFORMS=axon).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wavelet_tpu.core import haar, oracle
from wavelet_tpu.kernels import haar_pallas as hp
from wavelet_tpu.runtime import engine


@pytest.mark.parametrize("shape", [(4, 8, 16), (16, 32, 64), (8, 4, 2)])
def test_fused_forward_interpret_matches_oracle(shape):
    rng = np.random.default_rng(0)
    batch = (rng.standard_normal((3,) + shape) * 50).astype(np.float32)
    c, mx, mn = hp._fused_forward_call(jnp.asarray(batch), interpret=True)
    for i in range(3):
        want = oracle.haar_forward_oracle(batch[i])
        np.testing.assert_array_equal(np.asarray(c[i]).reshape(-1), want)
        assert float(mx[i]) == want.max()
        assert float(mn[i]) == want.min()


@pytest.mark.parametrize("shape", [(4, 8, 16), (8, 4, 2)])
def test_fused_inverse_interpret_matches_oracle(shape):
    rng = np.random.default_rng(1)
    flat = (rng.standard_normal((2, int(np.prod(shape)))) * 10).astype(np.float32)
    blocks = jnp.asarray(flat.reshape((2,) + shape))
    out = hp._fused_inverse_call(blocks, interpret=True)
    for i in range(2):
        want = oracle.haar_inverse_oracle(flat[i], *shape)
        np.testing.assert_array_equal(np.asarray(out[i]), want)


def test_resolve_signed_absmax_rules():
    maxv = np.array([5.0, 2.0, 4.0, 0.0], np.float32)
    minv = np.array([-3.0, -6.0, -4.0, 0.0], np.float32)
    # |max|>|min| -> max; |min|>|max| -> min; tie resolved via flat argmax
    flat = jnp.asarray(np.array([
        [5.0, -3.0, 0.0],
        [2.0, -6.0, 0.0],
        [-4.0, 4.0, 0.0],   # tie: -4 occurs first
        [0.0, 0.0, 0.0],
    ], np.float32))
    got = engine.resolve_signed_absmax(maxv.copy(), minv, flat_dev=flat)
    np.testing.assert_array_equal(got, [5.0, -6.0, -4.0, 0.0])


def test_engine_pallas_flag_off_on_cpu():
    e = engine.CodecEngine()
    assert e.use_pallas == (jax.devices()[0].platform == "tpu")
