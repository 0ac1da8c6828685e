"""Mesh / projection unit tests."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from hoig_tpu.geometry.mesh import (
    compute_barycenter,
    create_mapping,
    get_f2vts,
    get_map_fn_dim,
    load_obj,
    save_obj,
)
from hoig_tpu.geometry.projection import (
    HOGAN_EYE_Z,
    look_at,
    orthographic_proj_withz_fxfy,
    orthographic_proj_withz_idrot,
    to_view_space,
    vertices_to_faces,
)

OBJ_TEXT = """
# comment
mtllib foo.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vt 1 1
f 1/1 2/2 3/3
f 2/2 4/4 3/3
"""


def _write_obj():
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as fp:
        fp.write(OBJ_TEXT)
    return path


def test_load_obj_roundtrip():
    path = _write_obj()
    info = load_obj(path)
    assert info["vertices"].shape == (4, 3)
    assert info["faces"].shape == (2, 3)
    assert info["faces_vts"].shape == (2, 3)
    np.testing.assert_array_equal(info["faces"][0], [0, 1, 2])

    out = tempfile.mktemp(suffix=".obj")
    save_obj(info["vertices"], info["faces"], out)
    info2 = load_obj(out)
    np.testing.assert_allclose(info2["vertices"], info["vertices"])
    np.testing.assert_array_equal(info2["faces"], info["faces"])


def test_f2vts_and_mapping():
    path = _write_obj()
    f2vts = get_f2vts(path)
    assert f2vts.shape == (2, 3, 3)
    # v axis flipped: vt (0,0) -> (0, 1, 0)
    np.testing.assert_allclose(f2vts[0, 0], [0, 1, 0])

    # the reference "barycenter" is the v0-v1 edge midpoint
    # (utils/mesh.py:156-170: v2 + 0.5*(v0-v2) + 0.5*(v1-v2) = (v0+v1)/2)
    bc = compute_barycenter(f2vts)
    np.testing.assert_allclose(bc, 0.5 * (f2vts[:, 0] + f2vts[:, 1]), atol=1e-6)

    m = create_mapping("uv_seg", path)
    assert m.shape == (3, 3)  # 2 faces + bg row
    np.testing.assert_allclose(m[-1], [0, 0, 1])
    assert get_map_fn_dim("uv_seg") == 3


def test_vertices_to_faces():
    verts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    faces = jnp.asarray([[0, 1, 2], [1, 2, 3]], jnp.int32)
    out = np.asarray(vertices_to_faces(verts, faces))
    assert out.shape == (1, 2, 3, 3)
    np.testing.assert_allclose(out[0, 1, 0], [3, 4, 5])


def test_projection_idrot_centered_point():
    # a point on the optical axis at depth 2 with identity-ish intrinsics
    cam_mat = np.array([[100.0, 0, 128], [0, 100.0, 128], [0, 0, 1]], np.float32)
    crop = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    cam = np.concatenate([cam_mat.ravel(), crop.ravel()])[None].astype(np.float32)
    pts = jnp.asarray([[[0.0, 0.0, 2.0]]])
    out = np.asarray(orthographic_proj_withz_idrot(pts, jnp.asarray(cam)))
    # projects to pixel (128,128) -> NDC 2*128/255-1
    np.testing.assert_allclose(out[0, 0, :2], [2 * 128 / 255 - 1] * 2, atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2], -2.0, atol=1e-6)  # z negated


def test_projection_fxfy_no_flip_semantics():
    """DexYCB cam2pixel projects camera-frame points directly — no OpenGL
    flip, z stays the raw positive depth (HOIG_DexYCB/utils/nmr.py:39-50).
    Equivalent to the HOv3 path applied to pre-flipped points (xy), with
    opposite-sign z."""
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 5, 3).astype(np.float32)
    pts[:, :, 2] += 5.0
    fx, fy, cx, cy = 120.0, 130.0, 110.0, 115.0
    crop = rng.randn(2, 2, 3).astype(np.float32)
    cam_a = np.concatenate(
        [
            np.tile(
                np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1], np.float32)[None], (2, 1)
            ),
            crop.reshape(2, 6),
        ],
        axis=1,
    )
    cam_b = np.concatenate(
        [np.tile(np.array([fx, fy, cx, cy], np.float32)[None], (2, 1)), crop.reshape(2, 6)],
        axis=1,
    )
    flipped = pts * np.array([1, -1, -1], np.float32)
    a = np.asarray(
        orthographic_proj_withz_idrot(jnp.asarray(flipped), jnp.asarray(cam_a))
    )
    b = np.asarray(orthographic_proj_withz_fxfy(jnp.asarray(pts), jnp.asarray(cam_b)))
    # idrot's internal flip cancels the pre-flip, so both agree exactly
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_look_at_and_view_space_equivalence():
    rng = np.random.RandomState(1)
    pts = rng.randn(2, 7, 3).astype(np.float32)
    # HOGAN's camera: look_at with eye on -z and y-flip == to_view_space
    flipped = pts * np.array([1, -1, 1], np.float32)
    general = np.asarray(
        look_at(jnp.asarray(flipped), (0.0, 0.0, -HOGAN_EYE_Z))
    )
    fused = np.asarray(to_view_space(jnp.asarray(pts)))
    np.testing.assert_allclose(general, fused, rtol=1e-4, atol=1e-4)
