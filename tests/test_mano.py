"""MANO LBS invariant tests (no MANO pickle needed: synthetic model with the
real tensor shapes; the real asset is a registered download in the reference
too)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from hoig_tpu.geometry.mano import (
    MANOModel,
    mano_forward,
    pca_to_axisang,
    rodrigues,
)


@pytest.fixture(scope="module")
def model():
    return MANOModel.synthetic()


@pytest.fixture(scope="module")
def params(model):
    return model.as_jax()


def test_rodrigues_matches_scipy(rng):
    rvecs = rng.randn(20, 3).astype(np.float32)
    rvecs[0] = 0  # exact zero angle
    rvecs[1] *= 1e-9  # tiny angle
    ours = np.asarray(rodrigues(jnp.asarray(rvecs)))
    theirs = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_rest_pose_is_template(model, params):
    b = 2
    out = mano_forward(
        params,
        jnp.zeros((b, 3)),
        jnp.zeros((b, 45)),
        jnp.zeros((b, 10)),
    )
    verts = np.asarray(out["vertices"])
    np.testing.assert_allclose(verts[0], model.v_template, atol=1e-5)
    np.testing.assert_allclose(verts[0], verts[1], atol=1e-6)
    assert out["joints"].shape == (b, 21, 3)


def test_global_orient_rotates_rigidly(params, rng):
    rvec = rng.randn(1, 3).astype(np.float32)
    betas = (rng.randn(1, 10) * 0.5).astype(np.float32)
    pose = (rng.randn(1, 45) * 0.2).astype(np.float32)
    base = np.asarray(
        mano_forward(params, jnp.zeros((1, 3)), jnp.asarray(pose), jnp.asarray(betas))[
            "vertices"
        ]
    )
    rot = np.asarray(
        mano_forward(params, jnp.asarray(rvec), jnp.asarray(pose), jnp.asarray(betas))[
            "vertices"
        ]
    )
    r = Rotation.from_rotvec(rvec[0]).as_matrix()
    # root joint is the rotation pivot; with the synthetic regressor the
    # rest root is ~centroid — rotate about the *posed root joint*
    root = np.asarray(
        mano_forward(params, jnp.zeros((1, 3)), jnp.asarray(pose), jnp.asarray(betas))[
            "joints"
        ]
    )[0, 0]
    expected = (base[0] - root) @ r.T + root
    np.testing.assert_allclose(rot[0], expected, rtol=1e-3, atol=1e-4)


def test_transl_shifts(params, rng):
    t = rng.randn(1, 3).astype(np.float32)
    a = mano_forward(params, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)))
    b = mano_forward(
        params,
        jnp.zeros((1, 3)),
        jnp.zeros((1, 45)),
        jnp.zeros((1, 10)),
        transl=jnp.asarray(t),
    )
    np.testing.assert_allclose(
        np.asarray(b["vertices"]), np.asarray(a["vertices"]) + t[:, None], atol=1e-6
    )


def test_pca_frontend(params, rng):
    pca = rng.randn(2, 45).astype(np.float32)
    full = np.asarray(pca_to_axisang(jnp.asarray(pca), params))
    comps = np.asarray(params["hands_components"])
    mean = np.asarray(params["hands_mean"])
    np.testing.assert_allclose(full, pca @ comps + mean, rtol=1e-5, atol=1e-5)


def test_flat_hand_mean_toggle(params, rng):
    pose = rng.randn(1, 45).astype(np.float32)
    mean = np.asarray(params["hands_mean"])
    a = mano_forward(
        params, jnp.zeros((1, 3)), jnp.asarray(pose + mean), jnp.zeros((1, 10))
    )
    b = mano_forward(
        params,
        jnp.zeros((1, 3)),
        jnp.asarray(pose),
        jnp.zeros((1, 10)),
        flat_hand_mean=False,
    )
    np.testing.assert_allclose(
        np.asarray(a["vertices"]), np.asarray(b["vertices"]), rtol=1e-4, atol=1e-5
    )


def test_jit_and_vmap_compose(params):
    fwd = jax.jit(lambda go, hp, be: mano_forward(params, go, hp, be)["vertices"])
    out = fwd(jnp.zeros((4, 3)), jnp.zeros((4, 45)), jnp.zeros((4, 10)))
    assert out.shape == (4, 778, 3)
    grads = jax.grad(
        lambda hp: jnp.sum(mano_forward(params, jnp.zeros((1, 3)), hp, jnp.zeros((1, 10)))["vertices"] ** 2)
    )(jnp.zeros((1, 45)) + 0.1)
    assert np.isfinite(np.asarray(grads)).all()
