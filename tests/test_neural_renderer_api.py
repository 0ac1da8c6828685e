"""Generic Renderer/Mesh API tests (nr teapot-test analog on synthetic
geometry)."""

import os
import tempfile

import numpy as np

import jax.numpy as jnp

from hoig_tpu.geometry.neural_renderer_api import Mesh, Renderer


def _tetra_mesh():
    verts = np.array(
        [[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]], np.float32
    ) - 0.15
    faces = np.array(
        [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32
    )
    return verts, faces


def test_mesh_obj_roundtrip(rng):
    verts, faces = _tetra_mesh()
    colors = rng.rand(4, 1, 1, 1, 3).astype(np.float32)
    textures = np.broadcast_to(colors, (4, 3, 3, 3, 3)).copy()
    mesh = Mesh(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(textures))
    path = os.path.join(tempfile.mkdtemp(), "tetra.obj")
    mesh.save_obj(path)
    mesh2 = Mesh.from_obj(path, load_texture=True)
    np.testing.assert_allclose(np.asarray(mesh2.vertices), verts, atol=1e-5)
    assert mesh2.textures.shape[0] == 4


def test_renderer_modes():
    verts, faces = _tetra_mesh()
    r = Renderer(image_size=64, anti_aliasing=True)
    mesh = Mesh(jnp.asarray(verts), jnp.asarray(faces))

    sil = np.asarray(r.render_mesh(mesh, "silhouettes"))
    assert sil.shape == (1, 64, 64)
    assert 0 < sil.sum() < 64 * 64  # object visible, not full-frame

    depth = np.asarray(r.render_mesh(mesh, "depth"))
    assert depth.shape == (1, 64, 64)
    hit = depth < r.far - 1e-3
    assert hit.sum() > 10

    rgb = np.asarray(r.render_mesh(mesh, "rgb"))
    assert rgb.shape == (1, 3, 64, 64)
    # lit white texture: foreground pixels are bright, bg is background_color
    fg = rgb.max(axis=1)[0] > 0.1
    assert fg.sum() > 10

    soft = np.asarray(r.render_silhouettes(jnp.asarray(verts)[None],
                                           jnp.asarray(faces), soft=True))
    assert soft.shape == (1, 64, 64)
    assert ((soft > 0.5) & (sil[0] > 0.5)).sum() > 0.5 * (sil[0] > 0.5).sum()
