"""Rasterizer goldens — TPU analog of the neural_renderer unit tests
(thirdparty/neural_renderer/tests/test_rasterize*.py): geometric invariants
on synthetic triangles instead of Blender golden images."""

import numpy as np
import jax.numpy as jnp

from hoig_tpu.ops import rasterize_depth, rasterize_fim_wim, rasterize_silhouette


def tri(verts):
    """(3,3) -> (1,1,3,3) face tensor."""
    return jnp.asarray(np.asarray(verts, np.float32)[None, None])


def big_front_triangle(z=2.0):
    # CCW in screen space after the kernel's orientation convention
    return [[-0.9, -0.9, z], [0.9, -0.9, z], [0.0, 0.9, z]]


def test_single_triangle_coverage_and_flip():
    fim, wim = rasterize_fim_wim(tri(big_front_triangle()), image_size=32)
    fim = np.asarray(fim[0])
    assert (fim >= 0).sum() > 200  # roughly half the image
    # the triangle's apex is at NDC y=+0.9; after the vertical flip
    # convention (rasterize.py:338-345) +y should be at *low* row index
    rows_hit = np.where((fim >= 0).any(axis=1))[0]
    cov_top = (fim[rows_hit[0] + 1] >= 0).sum()
    cov_bottom = (fim[rows_hit[-1] - 1] >= 0).sum()
    assert cov_top < cov_bottom  # apex (narrow) is at the top of the image

    wim = np.asarray(wim[0])
    hit = fim >= 0
    np.testing.assert_allclose(wim[hit].sum(-1), 1.0, rtol=1e-5)
    assert np.all(wim[~hit] == 0)


def test_backface_culled():
    v = big_front_triangle()
    flipped = [v[0], v[2], v[1]]  # reversed winding
    fim, _ = rasterize_fim_wim(tri(flipped), image_size=32)
    assert int((np.asarray(fim) >= 0).sum()) == 0


def test_zbuffer_nearest_wins_and_tie_break():
    near_t = big_front_triangle(z=1.5)
    far_t = big_front_triangle(z=3.0)
    faces = jnp.asarray(np.asarray([far_t, near_t], np.float32)[None])
    fim, _ = rasterize_fim_wim(faces, image_size=32)
    hit = np.asarray(fim[0])
    assert set(np.unique(hit)) == {-1, 1}  # nearer face (index 1) wins

    # exact tie -> lowest index (CUDA ascending first-hit semantics)
    faces_tie = jnp.asarray(np.asarray([near_t, near_t], np.float32)[None])
    fim_tie, _ = rasterize_fim_wim(faces_tie, image_size=32)
    assert set(np.unique(np.asarray(fim_tie[0]))) == {-1, 0}


def test_face_valid_mask():
    near_t = big_front_triangle(z=1.5)
    far_t = big_front_triangle(z=3.0)
    faces = jnp.asarray(np.asarray([near_t, far_t], np.float32)[None])
    valid = jnp.asarray([[False, True]])
    fim, _ = rasterize_fim_wim(faces, valid, image_size=32)
    assert set(np.unique(np.asarray(fim[0]))) == {-1, 1}  # masked face skipped


def test_depth_map_perspective_correct():
    # triangle spanning z from 2 (bottom edge) to 4 (apex)
    v = [[-0.9, -0.9, 2.0], [0.9, -0.9, 2.0], [0.0, 0.9, 4.0]]
    dim = np.asarray(rasterize_depth(tri(v), image_size=64)[0])
    sil = dim < 99.0
    assert sil.sum() > 500
    zs = dim[sil]
    assert zs.min() >= 2.0 - 1e-3 and zs.max() <= 4.0 + 1e-3
    # after the vertical flip the far apex (NDC +y) is at low row index
    rows = np.where(sil.any(axis=1))[0]
    top_z = dim[rows[0], sil[rows[0]].argmax()]
    bot_z = dim[rows[-1], sil[rows[-1]].argmax()]
    assert top_z > bot_z


def test_silhouette_binary():
    sil = np.asarray(rasterize_silhouette(tri(big_front_triangle()), image_size=32))
    assert set(np.unique(sil)) <= {0.0, 1.0}
    assert sil.sum() > 0


def test_barycentric_weights_interpolate_linearly():
    # weight for vertex v should be 1 at v's pixel and decay linearly;
    # center pixel of the triangle has all weights ~1/3 for a symmetric tri
    v = [[-0.9, -0.5, 2.0], [0.9, -0.5, 2.0], [0.0, 0.9, 2.0]]
    s = 128
    fim, wim = rasterize_fim_wim(tri(v), image_size=s)
    fim, wim = np.asarray(fim[0]), np.asarray(wim[0])
    # centroid NDC ~ (0, -0.0333); pixel = (v+1)*s/2 roughly; flipped row
    cx = int((0.0 + 1) * s / 2)
    cy = s - 1 - int((-0.0333 + 1) * s / 2)
    assert fim[cy, cx] == 0
    np.testing.assert_allclose(wim[cy, cx], [1 / 3] * 3, atol=0.05)


def test_pallas_rasterizer_matches_xla(rng):
    """The Pallas tiled kernel (interpret mode on CPU) must match the XLA
    chunked reduction exactly on fim and to float tolerance on wim."""
    import functools

    from jax.experimental import pallas as pl

    import hoig_tpu.ops.rasterizer_pallas as rp

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        B, F, S = 2, 300, 128
        fv = rng.randn(B, F, 3, 3).astype(np.float32) * 0.4
        fv[:, :, :, 2] = np.abs(fv[:, :, :, 2]) + 1.5
        valid = rng.rand(B, F) > 0.1
        fim_p, wim_p = rp.rasterize_fim_wim_pallas(
            jnp.asarray(fv), jnp.asarray(valid), image_size=S
        )
        fim_x, wim_x = rasterize_fim_wim(
            jnp.asarray(fv), jnp.asarray(valid), image_size=S
        )
        np.testing.assert_array_equal(np.asarray(fim_p), np.asarray(fim_x))
        np.testing.assert_allclose(np.asarray(wim_p), np.asarray(wim_x), atol=1e-4)
    finally:
        pl.pallas_call = orig


def test_soft_silhouette_differentiable():
    """Soft coverage agrees with the hard mask away from edges and carries
    usable vertex gradients (the capability the reference's backward CUDA
    kernels provide)."""
    import jax

    from hoig_tpu.ops.rasterizer import soft_silhouette

    v = jnp.asarray(
        np.asarray([[[-0.8, -0.8, 2.0], [0.8, -0.8, 2.0], [0.0, 0.8, 2.0]]],
                   np.float32)[None]
    )
    soft = np.asarray(soft_silhouette(v, image_size=64, sigma=0.5))
    hard = np.asarray(rasterize_silhouette(v, image_size=64))
    interior = soft > 0.95
    exterior = soft < 0.05
    assert (hard[interior] == 1).mean() > 0.98
    assert (hard[exterior] == 0).mean() > 0.98

    def area(verts):
        return jnp.sum(soft_silhouette(verts, image_size=64, sigma=1.0))

    g = np.asarray(jax.grad(area)(v))
    assert np.isfinite(g).all() and np.abs(g).max() > 0
    # growing the triangle must grow the area: gradient along outward x
    assert g[0, 0, 1, 0] > 0  # right vertex, +x grows area
    assert g[0, 0, 0, 0] < 0  # left vertex, -x grows area


def test_fused_attr_rows_match_separate_encode(rng):
    """rasterize_fim_wim_auto(attrs=...) must return exactly the rows a
    separate fim-indexed encode gather produces — the fused finish-gather
    path (TPU) and the take_along_axis fallback share one contract with
    renderer.encode_and_warp (fim < 0 -> background row)."""
    import functools

    from jax.experimental import pallas as pl

    import hoig_tpu.ops.rasterizer_pallas as rp

    B, F, S, A = 2, 300, 128, 16
    fv = rng.randn(B, F, 3, 3).astype(np.float32) * 0.4
    fv[:, :, :, 2] = np.abs(fv[:, :, :, 2]) + 1.5
    valid = rng.rand(B, F) > 0.1
    attrs = rng.randn(B, F + 1, A).astype(np.float32)

    # fallback path (XLA rasterizer + take_along_axis)
    fim, wim, rows = rp.rasterize_fim_wim_auto(
        jnp.asarray(fv), jnp.asarray(valid), image_size=S,
        attrs=jnp.asarray(attrs),
    )
    fim, rows = np.asarray(fim), np.asarray(rows)
    idx = np.where(fim < 0, F, fim)
    expect = np.take_along_axis(
        attrs, idx.reshape(B, -1, 1), axis=1
    ).reshape(B, S, S, A)
    np.testing.assert_array_equal(rows, expect)

    # pallas finish gather (interpret mode) — same fim/wim AND rows
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        fim_p, wim_p, rows_p = rp.rasterize_fim_wim_pallas(
            jnp.asarray(fv), jnp.asarray(valid), image_size=S,
            attrs=jnp.asarray(attrs),
        )
        np.testing.assert_array_equal(np.asarray(fim_p), fim)
        np.testing.assert_allclose(np.asarray(wim_p), np.asarray(wim), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(rows_p), expect)
    finally:
        pl.pallas_call = orig
