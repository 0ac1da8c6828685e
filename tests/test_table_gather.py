"""Exactness tests for the MXU one-hot row gather (ops/table_gather.py).

The kernel must be BIT-IDENTICAL to take_along_axis: the conditioning
stage compares gathered semantic ids with `==` and the uv rows drive
warps that are oracle-tested against the torch reference. Runs in Pallas
interpret mode on CPU (tests/conftest.py pins the cpu backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoig_tpu.ops.table_gather import _split3_bf16, gather_rows, gather_rows_mxu


def test_split3_bf16_exact():
    rng = np.random.RandomState(0)
    # adversarial mantissas: random f32 over many scales + exact ids
    t = np.concatenate([
        rng.randn(4096) * 10.0 ** rng.randint(-6, 6, 4096),
        np.arange(-32, 32),
    ]).astype(np.float32)
    planes = _split3_bf16(jnp.asarray(t))
    recon = (planes[0].astype(jnp.float32) + planes[1].astype(jnp.float32)
             + planes[2].astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(recon), t)


@pytest.mark.parametrize("r,a,p", [(1664, 25, 1000), (130, 6, 513), (7, 3, 64)])
def test_gather_rows_mxu_bit_exact(r, a, p):
    rng = np.random.RandomState(1)
    b = 2
    table = rng.randn(b, r, a).astype(np.float32)
    idx = rng.randint(0, r, (b, p)).astype(np.int32)
    out = gather_rows_mxu(jnp.asarray(table), jnp.asarray(idx))
    ref = np.take_along_axis(table, idx[..., None], axis=1).transpose(0, 2, 1)
    assert out.shape == (b, a, p)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_gather_rows_dispatch_cpu():
    rng = np.random.RandomState(2)
    table = rng.randn(3, 40, 5).astype(np.float32)
    idx = rng.randint(0, 40, (3, 77)).astype(np.int32)
    out = gather_rows(jnp.asarray(table), jnp.asarray(idx))
    ref = np.take_along_axis(table, idx[..., None], axis=1).transpose(0, 2, 1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_gather_rows_mxu_under_jit_and_vjp_free():
    # the conditioning stage runs under stop_gradient; the kernel itself
    # must at least trace under jit inside a larger program
    table = jnp.asarray(np.random.RandomState(3).randn(1, 256, 9), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(4).randint(0, 256, (1, 128)), jnp.int32)

    @jax.jit
    def f(t, i):
        return gather_rows_mxu(t, i).sum()

    v = f(table, idx)
    assert np.isfinite(float(v))
