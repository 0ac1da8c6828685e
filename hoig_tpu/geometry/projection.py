"""Camera projection for the HOGAN conditioning stage, in JAX.

Capability parity with HOIG_HOv3/utils/nmr.py:109-140
(`orthographic_proj_withz_idrot`) and the neural renderer's look_at
(thirdparty/neural_renderer/neural_renderer/look_at.py:6-62) /
vertices_to_faces (vertices_to_faces.py:4-22). Fully batched; no per-sample
Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # full-f32 projection math
import numpy as np

# The renderer views the NDC plane from eye = (0, 0, -(1/tan(30deg) + 1))
# looking at the origin with +y up (utils/nmr.py:356-357). With that eye the
# general look_at rotation is the identity, so the transform is a pure
# z-translation — kept as a named constant instead of re-deriving it per
# call like the reference does.
HOGAN_VIEWING_ANGLE = 30.0
HOGAN_EYE_Z = float(1.0 / np.tan(np.radians(HOGAN_VIEWING_ANGLE)) + 1.0)


def orthographic_proj_withz_idrot(
    pts3d: jax.Array, cam: jax.Array, offset_z: float = 0.0, image_size: int = 256
) -> jax.Array:
    """Project 3-D points through camMat + crop affine (nmr.py:109-140).

    Args:
      pts3d: (B, N, 3) in the dataset's OpenCV-style camera frame.
      cam: (B, 15) = 3x3 intrinsics (row-major) ++ 2x3 crop affine.
      offset_z: added to the returned z.
      image_size: the reference hardcodes the /255 normalization for 256
        crops (nmr.py:137); kept parameterized as (size - 1).

    Returns:
      (B, N, 3): x,y in [-1, 1] crop NDC; z = -z_cam + offset_z (the
      OpenGL-coordinate flip of nmr.py:124-127 negates z).
    """
    bs = cam.shape[0]
    cam_mat = cam[:, 0:9].reshape(bs, 3, 3)
    trans = cam[:, 9:15].reshape(bs, 2, 3)

    # OpenGL coordinate flip: (x, y, z) -> (x, -y, -z).
    flipped = pts3d * jnp.asarray([1.0, -1.0, -1.0], dtype=pts3d.dtype)

    proj = jnp.einsum("bnk,bmk->bnm", flipped, cam_mat, precision=_HI)
    xy = proj[:, :, :2] / proj[:, :, 2:3]
    ones = jnp.ones_like(xy[:, :, :1])
    xy1 = jnp.concatenate([xy, ones], axis=2)
    xy_crop = jnp.einsum("bmk,bnk->bnm", trans, xy1, precision=_HI)
    xy_ndc = xy_crop / float(image_size - 1) * 2.0 - 1.0
    z = flipped[:, :, 2:3] + offset_z
    return jnp.concatenate([xy_ndc, z], axis=2)


def orthographic_proj_withz_fxfy(
    pts3d: jax.Array, cam: jax.Array, offset_z: float = 0.0, image_size: int = 256
) -> jax.Array:
    """DexYCB-variant projection (HOIG_DexYCB/utils/nmr.py:39-50,146-161):
    cam = (B, 10) = [fx, fy, cx, cy] ++ 2x3 crop affine.

    Unlike the HOv3 camMat variant there is NO OpenGL coordinate flip —
    cam2pixel consumes the camera-frame points directly (x/(z+1e-8)) and
    the returned z is the raw positive camera depth.
    """
    bs = cam.shape[0]
    f = cam[:, 0:2]
    c = cam[:, 2:4]
    trans = cam[:, 4:10].reshape(bs, 2, 3)

    z = pts3d[:, :, 2:3]
    xy = pts3d[:, :, :2] / (z + 1e-8) * f[:, None, :] + c[:, None, :]
    ones = jnp.ones_like(xy[:, :, :1])
    xy1 = jnp.concatenate([xy, ones], axis=2)
    xy_crop = jnp.einsum("bmk,bnk->bnm", trans, xy1, precision=_HI)
    xy_ndc = xy_crop / float(image_size - 1) * 2.0 - 1.0
    return jnp.concatenate([xy_ndc, z + offset_z], axis=2)


def look_at(
    vertices: jax.Array,
    eye,
    at=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
) -> jax.Array:
    """General look-at transform (look_at.py:6-62). (B, N, 3) -> (B, N, 3)."""
    eye = jnp.asarray(eye, dtype=vertices.dtype)
    at = jnp.asarray(at, dtype=vertices.dtype)
    up = jnp.asarray(up, dtype=vertices.dtype)

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-5)

    z_axis = norm(at - eye)
    x_axis = norm(jnp.cross(up, z_axis))
    y_axis = norm(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # (3, 3)
    return jnp.einsum("bnk,mk->bnm", vertices - eye, r, precision=_HI)


def to_view_space(proj_verts: jax.Array) -> jax.Array:
    """HOGAN's fixed-camera look_at: y-flip then shift z by the eye distance.

    Folds nmr.py:505-508 (`proj_verts[:, :, 1] *= -1; nr.look_at(...)`) into
    one fused elementwise op.
    """
    flip = jnp.asarray([1.0, -1.0, 1.0], dtype=proj_verts.dtype)
    shift = jnp.asarray([0.0, 0.0, HOGAN_EYE_Z], dtype=proj_verts.dtype)
    return proj_verts * flip + shift


def vertices_to_faces(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Gather per-face vertex coords.

    Args:
      vertices: (B, V, 3).
      faces: (F, 3) or (B, F, 3) int; padded entries may be negative (they
        gather vertex 0 — callers mask them via face validity).

    Returns:
      (B, F, 3, 3).
    """
    if faces.ndim == 2:
        faces = jnp.broadcast_to(faces[None], (vertices.shape[0],) + faces.shape)
    b, f, _ = faces.shape
    safe = jnp.clip(faces, 0, vertices.shape[1] - 1).reshape(b, f * 3, 1)
    gathered = jnp.take_along_axis(vertices, safe, axis=1)
    return gathered.reshape(b, f, 3, 3)


def proj_func(points: jax.Array, transl: jax.Array, rot: jax.Array,
              center: jax.Array, focal: float = 5000.0) -> jax.Array:
    """Fixed-focal perspective projection helper (reference
    models/networks/hmr.py:13-42 `proj_func`): rotate+translate, pinhole
    project with a diagonal 5000-focal camera, shift by `center`, and
    normalize /255*2-1.

    points: (B, N, 3); transl: (B, 3); rot: (B, 3, 3); center: (B, 2).
    """
    cam = jnp.einsum("bij,bnj->bni", rot, points, precision=_HI) + transl[:, None]
    xy = cam[..., :2] / cam[..., 2:3]
    img = xy * focal + center[:, None, :]
    return img / 255.0 * 2.0 - 1.0
