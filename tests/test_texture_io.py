"""Textured OBJ IO + UV-image fit + texture render tests."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from hoig_tpu.geometry.obj_io import (
    create_texture_image,
    load_obj_with_textures,
    load_textures_from_image,
    save_obj_textured,
)
from hoig_tpu.geometry.uv_image import compute_uv_image, create_uvsampler, cvt_fim_enc
from hoig_tpu.ops.texture import lighting, sample_textures_trilinear


def test_load_textures_constant_image(rng):
    img = np.full((32, 32, 3), 0.7, np.float32)
    vts = rng.rand(9, 2).astype(np.float32)
    faces_vts = np.arange(9, dtype=np.int32).reshape(3, 3)
    tex = load_textures_from_image(img, vts, faces_vts, tex_size=3)
    assert tex.shape == (3, 3, 3, 3, 3)
    np.testing.assert_allclose(tex, 0.7, atol=1e-6)


def test_texture_image_roundtrip(rng):
    """create_texture_image -> reload through an OBJ -> same face colors."""
    f = 5
    colors = rng.rand(f, 1, 1, 1, 3).astype(np.float32)
    textures = np.broadcast_to(colors, (f, 3, 3, 3, 3)).copy()
    d = tempfile.mkdtemp()
    path = os.path.join(d, "mesh.obj")
    verts = rng.randn(6, 3).astype(np.float32)
    faces = rng.randint(0, 6, (f, 3)).astype(np.int32)
    save_obj_textured(path, verts, faces, textures)
    assert os.path.exists(os.path.join(d, "mesh.mtl"))
    assert os.path.exists(os.path.join(d, "mesh.png"))
    info, tex2 = load_obj_with_textures(path, tex_size=3)
    np.testing.assert_array_equal(info["faces"], faces)
    # per-face flat colors survive the pack/unpack
    got = tex2.reshape(f, -1, 3).mean(axis=1)
    np.testing.assert_allclose(got, colors.reshape(f, 3), atol=0.05)


def test_create_uvsampler_and_cvt(rng):
    d = tempfile.mkdtemp()
    path = os.path.join(d, "m.obj")
    with open(path, "w") as fp:
        fp.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        fp.write("vt 0.1 0.1\nvt 0.9 0.1\nvt 0.1 0.9\n")
        fp.write("f 1/1 2/2 3/3\n")
    uv = create_uvsampler(path, tex_size=2)
    assert uv.shape == (1, 4, 2)
    assert uv.min() >= -1 and uv.max() <= 1

    enc = rng.rand(8, 8, 3).astype(np.float32)
    img = cvt_fim_enc(enc, "uv_seg")
    assert img.shape == (3, 8, 8)
    assert cvt_fim_enc(enc[:, :, :1], "seg").shape == (8, 8)


def test_compute_uv_image_fits_constant():
    f, t = 4, 3
    uv = (np.random.RandomState(0).rand(f, t, t, 2) * 2 - 1).astype(np.float32)
    texture = np.full((f, t, t, 3), 0.5, np.float32)
    img = compute_uv_image(uv, texture, uv_size=16, steps=300)
    assert img.shape == (3, 16, 16)
    # sampled locations should approach 0.5
    from hoig_tpu.ops.grid_sample import grid_sample

    got = np.asarray(
        grid_sample(jnp.asarray(img[None]), jnp.asarray(uv.reshape(1, f, t * t, 2)))
    )
    np.testing.assert_allclose(got.mean(), 0.5, atol=0.05)


def test_lighting_and_trilinear_sampling(rng):
    fv = jnp.asarray(rng.randn(1, 4, 3, 3).astype(np.float32))
    tex = jnp.ones((1, 4, 3, 3, 3, 3))
    lit = lighting(fv, tex, intensity_ambient=1.0, intensity_directional=0.0)
    np.testing.assert_allclose(np.asarray(lit), 1.0, atol=1e-6)
    lit2 = lighting(fv, tex, intensity_ambient=0.3, intensity_directional=0.7)
    arr = np.asarray(lit2)
    assert (arr >= 0.3 - 1e-5).all() and (arr <= 1.0 + 1e-5).all()

    fim = jnp.asarray(np.array([[[0, -1], [2, 3]]], np.int32))
    wim = jnp.asarray(rng.dirichlet([1, 1, 1], (1, 2, 2)).astype(np.float32))
    colors = rng.rand(1, 4, 1, 1, 1, 3).astype(np.float32)
    cube = jnp.asarray(np.broadcast_to(colors, (1, 4, 3, 3, 3, 3)).copy())
    out = np.asarray(sample_textures_trilinear(cube, fim, wim, (9, 9, 9)))
    np.testing.assert_allclose(out[0, 0, 0], colors[0, 0, 0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 1], [9, 9, 9])  # bg
    np.testing.assert_allclose(out[0, 1, 1], colors[0, 3, 0, 0, 0], rtol=1e-5)
