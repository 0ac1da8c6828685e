"""local_combine kernel (ops/local_combine.py): forward parity with the
plain-XLA loop form and gradcheck of the custom VJP (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoig_tpu.ops.local_combine import local_combine, local_combine_reference


def _case(rng, b=2, h=12, w=16, c=8, radius=2, d_extra=0):
    k = 2 * radius + 1
    src = rng.randn(b, h + 2 * radius, w + 2 * radius, c).astype(np.float32)
    v = rng.randn(b, h, w, k * k + d_extra).astype(np.float32)
    return jnp.asarray(src), jnp.asarray(v)


@pytest.mark.parametrize("radius,d_extra", [(2, 0), (3, 0), (5, 7)])
def test_forward_matches_reference(radius, d_extra):
    rng = np.random.RandomState(0)
    src, v = _case(rng, radius=radius, d_extra=d_extra)
    out = local_combine(src, v, radius)
    ref = local_combine_reference(src, v, radius)
    # fma-vs-separate rounding between interpret mode and the XLA loop
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_vjp_matches_reference_grads():
    rng = np.random.RandomState(1)
    src, v = _case(rng, radius=2)
    cotan = jnp.asarray(rng.randn(*local_combine(src, v, 2).shape).astype(np.float32))

    def f_kernel(s, vv):
        return jnp.vdot(local_combine(s, vv, 2), cotan)

    def f_ref(s, vv):
        return jnp.vdot(local_combine_reference(s, vv, 2), cotan)

    gs_k, gv_k = jax.grad(f_kernel, argnums=(0, 1))(src, v)
    gs_r, gv_r = jax.grad(f_ref, argnums=(0, 1))(src, v)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gs_r), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_r), rtol=1e-5,
                               atol=1e-5)


def test_vjp_ignored_columns_zero_grad():
    rng = np.random.RandomState(2)
    src, v = _case(rng, radius=1, d_extra=5)

    g = jax.grad(lambda s, vv: jnp.sum(local_combine(s, vv, 1) ** 2),
                 argnums=1)(src, v)
    assert float(jnp.abs(g[..., 9:]).sum()) == 0.0
    assert float(jnp.abs(g[..., :9]).sum()) > 0.0


def test_bf16_inputs_f32_accumulation():
    rng = np.random.RandomState(3)
    src, v = _case(rng, radius=2)
    out = local_combine(src.astype(jnp.bfloat16), v.astype(jnp.bfloat16), 2)
    ref = local_combine_reference(
        src.astype(jnp.bfloat16), v.astype(jnp.bfloat16), 2
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )
