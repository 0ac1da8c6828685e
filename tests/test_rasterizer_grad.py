"""Exact rasterizer backward vs a scalar oracle transcribing the reference
CUDA semantics (rasterize_cuda_kernel.cu backward_pixel_map :263-521,
backward_depth_map :561-611), plus end-to-end descent sanity.

The oracle is a per-face python loop in float64 — deliberately the
reference's algorithm, kept in tests as the parity spec; the framework
implementation is the vectorized TPU formulation in
hoig_tpu/ops/rasterizer_grad.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoig_tpu.ops.rasterizer import rasterize_fim_wim
from hoig_tpu.ops.rasterizer_grad import (
    backward_depth_map,
    backward_pixel_map,
    rasterize_depth_exact,
    rasterize_silhouette_exact,
)


# ------------------------------------------------------------------ oracle
def oracle_pixel_map(face, fim, alpha, g_alpha, rgb, g_rgb, is_, eps):
    """Scalar transcription of backward_pixel_map for ONE face.

    face: (3,3) float64 NDC. Maps are unflipped (S,S[,3]).
    Returns (3,3) grad (z rows zero)."""
    grad = np.zeros((3, 3))
    if (face[2, 1] - face[0, 1]) * (face[1, 0] - face[0, 0]) < (
        face[1, 1] - face[0, 1]
    ) * (face[2, 0] - face[0, 0]):
        return grad  # backface

    def amap(r, c):
        return alpha[r, c] if alpha is not None else 0.0

    def gamap(r, c):
        return g_alpha[r, c] if g_alpha is not None else 0.0

    def rmap(r, c):
        return rgb[r, c] if rgb is not None else np.zeros(3)

    def grmap(r, c):
        return g_rgb[r, c] if g_rgb is not None else np.zeros(3)

    fn = 0  # oracle is called with fim already equal to 0/-1 for this face

    for edge_num in range(3):
        pi = [(edge_num + k) % 3 for k in range(3)]
        pp = [
            [0.5 * (face[pi[k], d] * is_ + is_ - 1) for d in range(2)]
            for k in range(3)
        ]
        for axis in range(2):
            p = [[pp[k][(d + axis) % 2] for d in range(2)] for k in range(3)]
            if axis == 0:
                direction = -1 if p[0][0] < p[1][0] else 1
            else:
                direction = 1 if p[0][0] < p[1][0] else -1

            d0_from = int(max(math.ceil(min(p[0][0], p[1][0])), 0.0))
            d0_to = int(min(max(p[0][0], p[1][0]), is_ - 1.0))
            for d0 in range(d0_from, d0_to + 1):
                if p[1][0] == p[0][0]:
                    continue  # division by zero -> oob d1 in CUDA
                d1_cross = (p[1][1] - p[0][1]) / (p[1][0] - p[0][0]) * (
                    d0 - p[0][0]
                ) + p[0][1]
                d1_in = (
                    math.floor(d1_cross) if direction > 0 else math.ceil(d1_cross)
                )
                d1_out = d1_in + direction
                if not (0 <= d1_in < is_ and 0 <= d1_out < is_):
                    continue

                def at(d1):
                    return (d1, d0) if axis == 0 else (d0, d1)

                alpha_in = amap(*at(d1_in))
                alpha_out = amap(*at(d1_out))
                rgb_in = rmap(*at(d1_in))
                rgb_out = rmap(*at(d1_out))

                def accum(d1, diff_grad):
                    if diff_grad <= 0:
                        return
                    if p[1][0] != d0:
                        dist = (
                            (p[1][0] - p[0][0]) / (p[1][0] - d0)
                            * (d1 - d1_cross) * 2.0 / is_
                        )
                        dist = dist + eps if dist > 0 else dist - eps
                        grad[pi[0], 1 - axis] -= diff_grad / dist
                    if p[0][0] != d0:
                        dist = (
                            (p[1][0] - p[0][0]) / (d0 - p[0][0])
                            * (d1 - d1_cross) * 2.0 / is_
                        )
                        dist = dist + eps if dist > 0 else dist - eps
                        grad[pi[1], 1 - axis] -= diff_grad / dist

                # OUT walk
                if fim[at(d1_in)] == fn:
                    d1_limit = is_ - 1 if direction > 0 else 0
                    for d1 in range(
                        max(min(d1_out, d1_limit), 0),
                        min(max(d1_out, d1_limit), is_ - 1) + 1,
                    ):
                        diff = (amap(*at(d1)) - alpha_in) * gamap(*at(d1))
                        diff += float(
                            np.dot(rmap(*at(d1)) - rgb_in, grmap(*at(d1)))
                        )
                        accum(d1, diff)

                # IN walk
                if (d0 - p[0][0]) * (d0 - p[2][0]) < 0:
                    d0_cross2 = (p[2][1] - p[0][1]) / (p[2][0] - p[0][0]) * (
                        d0 - p[0][0]
                    ) + p[0][1]
                else:
                    if p[1][0] == p[2][0]:
                        continue
                    d0_cross2 = (p[1][1] - p[2][1]) / (p[1][0] - p[2][0]) * (
                        d0 - p[2][0]
                    ) + p[2][1]
                d1_limit = (
                    math.ceil(d0_cross2) if direction > 0 else math.floor(d0_cross2)
                )
                for d1 in range(
                    max(min(d1_in, d1_limit), 0),
                    min(max(d1_in, d1_limit), is_ - 1) + 1,
                ):
                    if fim[at(d1)] != fn:
                        continue
                    diff = (amap(*at(d1)) - alpha_out) * gamap(*at(d1))
                    diff += float(
                        np.dot(rmap(*at(d1)) - rgb_out, grmap(*at(d1)))
                    )
                    accum(d1, diff)
    return grad


def _random_triangle(rng, z=2.0):
    """A front-facing triangle roughly inside the view."""
    while True:
        v = rng.uniform(-0.8, 0.8, size=(3, 2))
        area2 = (v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1]) - (
            v[2, 0] - v[0, 0]
        ) * (v[1, 1] - v[0, 1])
        if area2 > 0.15:  # front-facing per the kernel's test, non-degenerate
            break
    return np.concatenate([v, np.full((3, 1), z)], axis=1)


EPS = 1e-4


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("mode", ["alpha", "rgb", "both"])
def test_backward_pixel_map_matches_oracle(seed, mode):
    is_ = 24
    rng = np.random.RandomState(seed)
    face = _random_triangle(rng)
    fv = jnp.asarray(face[None, None], jnp.float32)  # (1,1,3,3)

    fim, _ = rasterize_fim_wim(fv, image_size=is_)
    fim_u = np.asarray(fim)[0][::-1]  # unflipped
    alpha_u = (fim_u >= 0).astype(np.float64)
    rgb_u = rng.rand(is_, is_, 3)
    g_alpha = rng.randn(is_, is_)
    g_rgb = rng.randn(is_, is_, 3)

    use_a = mode in ("alpha", "both")
    use_r = mode in ("rgb", "both")

    got = backward_pixel_map(
        fv, None, jnp.asarray(fim_u[None]),
        alpha=jnp.asarray(alpha_u[None], jnp.float32) if use_a else None,
        grad_alpha=jnp.asarray(g_alpha[None], jnp.float32) if use_a else None,
        rgb=jnp.asarray(rgb_u[None], jnp.float32) if use_r else None,
        grad_rgb=jnp.asarray(g_rgb[None], jnp.float32) if use_r else None,
        image_size=is_, eps=EPS,
    )
    want = oracle_pixel_map(
        face, fim_u,
        alpha_u if use_a else None, g_alpha if use_a else None,
        rgb_u if use_r else None, g_rgb if use_r else None,
        is_, EPS,
    )
    np.testing.assert_allclose(
        np.asarray(got)[0, 0], want, rtol=2e-3, atol=2e-3 * max(1, np.abs(want).max())
    )
    assert np.abs(want).max() > 0  # scene actually produced gradients


def test_backward_pixel_map_multiface_consistency():
    """Two disjoint faces get the same grads as each alone (oracle runs
    per-face with a fim masked to that face, like the CUDA one-thread-per-
    face view)."""
    is_ = 24
    rng = np.random.RandomState(7)
    f1 = _random_triangle(rng) * np.array([0.5, 0.5, 1.0]) + np.array(
        [-0.45, -0.45, 0.0]
    )
    f2 = _random_triangle(rng) * np.array([0.5, 0.5, 1.0]) + np.array(
        [0.45, 0.45, 0.0]
    )
    fv = jnp.asarray(np.stack([f1, f2])[None], jnp.float32)  # (1,2,3,3)
    fim, _ = rasterize_fim_wim(fv, image_size=is_)
    fim_u = np.asarray(fim)[0][::-1]
    alpha_u = (fim_u >= 0).astype(np.float64)
    g_alpha = np.random.RandomState(8).randn(is_, is_)

    got = backward_pixel_map(
        fv, None, jnp.asarray(fim_u[None]),
        alpha=jnp.asarray(alpha_u[None], jnp.float32),
        grad_alpha=jnp.asarray(g_alpha[None], jnp.float32),
        rgb=None, grad_rgb=None, image_size=is_, eps=EPS,
    )
    for i, face in enumerate([f1, f2]):
        fim_i = np.where(fim_u == i, 0, -1)
        want = oracle_pixel_map(
            face, fim_i, alpha_u, g_alpha, None, None, is_, EPS
        )
        np.testing.assert_allclose(
            np.asarray(got)[0, i], want, rtol=2e-3,
            atol=2e-3 * max(1, np.abs(want).max()),
        )


def oracle_depth_map(face, fim, depth, g_depth, is_):
    """Scalar transcription of backward_depth_map for face id 0."""
    from hoig_tpu.ops.rasterizer import _face_setup

    setup = _face_setup(jnp.asarray(face[None], jnp.float32), None, is_)
    finv = np.asarray(setup["finv"])[0]  # (3,3) rows=vertex
    grad = np.zeros((3, 3))
    for r in range(is_):
        for c in range(is_):
            if fim[r, c] != 0:
                continue
            xi, yi = float(c), float(r)
            w = finv[:, 0] * xi + finv[:, 1] * yi + finv[:, 2]
            w = np.clip(w, 0, 1)
            w = w / max(w.sum(), 1e-12)
            d = depth[r, c]
            g = g_depth[r, c]
            d2 = d * d
            for k in range(3):
                zk = face[k, 2]
                grad[k, 2] += g * w[k] * d2 / (zk * zk)
            tmp = np.zeros(3)
            for k in range(3):
                for ll in range(3):
                    tmp[k] += -finv[ll, k] / face[ll, 2]
            for k in range(3):
                for ll in range(2):
                    grad[k, ll] += -g * tmp[ll] * w[k] * d2 * is_ / 2
    return grad


def test_backward_depth_map_matches_oracle():
    is_ = 24
    rng = np.random.RandomState(3)
    face = _random_triangle(rng)
    face[:, 2] = [1.5, 2.0, 2.5]  # sloped depth
    fv = jnp.asarray(face[None, None], jnp.float32)

    d = rasterize_depth_exact(fv, jnp.ones((1, 1)), is_)
    from hoig_tpu.ops.rasterizer import rasterize_fim_wim as _rfw

    fim, _ = _rfw(fv, image_size=is_)
    fim_u = np.asarray(fim)[0][::-1]
    d_u = np.asarray(d)[0][::-1]
    g = np.random.RandomState(4).randn(is_, is_)

    got = backward_depth_map(
        fv, None, jnp.asarray(fim_u[None]), jnp.asarray(d_u[None], jnp.float32),
        jnp.asarray(g[None], jnp.float32), is_,
    )
    want = oracle_depth_map(face, fim_u, d_u, g, is_)
    np.testing.assert_allclose(np.asarray(got)[0, 0], want, rtol=1e-3, atol=1e-4)
    assert np.abs(want).max() > 0


def test_silhouette_exact_descent_improves_iou():
    """End-to-end: the custom VJP actually moves vertices toward a target
    silhouette (the reference's canonical use, e.g. examples/example4)."""
    is_ = 32
    src = np.array(
        [[-0.2, -0.2, 2.0], [0.6, -0.1, 2.0], [0.0, 0.6, 2.0]], np.float32
    )
    tgt = src + np.array([[-0.35, -0.1, 0.0]], np.float32)  # shifted target
    target = rasterize_silhouette_exact(
        jnp.asarray(tgt[None, None]), jnp.ones((1, 1)), is_
    )

    def loss(v):
        sil = rasterize_silhouette_exact(v, jnp.ones((1, 1)), is_)
        return jnp.mean((sil - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    v = jnp.asarray(src[None, None])
    l0, g = vg(v)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).max() > 0
    assert float(jnp.abs(g[..., 2]).max()) == 0.0  # pixel map has no z-grad
    for _ in range(150):
        _, g = vg(v)
        v = v - 0.01 * g / (jnp.abs(g).max() + 1e-9)  # normalized steps
    l1 = loss(v)
    # converges to (near-)exact silhouette match
    assert float(l1) < 0.2 * float(l0), (float(l0), float(l1))


def test_depth_exact_grad_matches_finite_difference_interior():
    """Depth z-gradients are exact (not edge-approximate): check against
    finite differences of a z-only perturbation (faces stay pixel-stable)."""
    is_ = 32
    face = np.array(
        [[-0.5, -0.5, 1.8], [0.7, -0.3, 2.2], [0.0, 0.7, 2.6]], np.float32
    )
    fv = jnp.asarray(face[None, None])
    valid = jnp.ones((1, 1))

    def f(dz):
        shifted = fv.at[..., 2].add(dz)
        d = rasterize_depth_exact(shifted, valid, is_)
        # (far - d)^2 zeroes the background so the f32 sum keeps precision
        return jnp.sum((100.0 - d) ** 2)

    g = jax.grad(f)(jnp.float32(0.0))
    # h large enough that the delta clears float32 rounding on the sum
    h = 1e-2
    fd = (f(jnp.float32(h)) - f(jnp.float32(-h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
