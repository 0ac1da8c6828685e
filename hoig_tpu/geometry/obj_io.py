"""Textured OBJ IO: MTL texture <-> per-face texture tensors.

Capability parity with the neural renderer's remaining two native ops
(SURVEY.md §2 checklist items 2-3):
  * load_textures (thirdparty/neural_renderer/.../load_textures_cuda_kernel
    .cu via load_obj.py:30-152): MTL texture image -> per-face
    (T, T, T, 3) texel cubes, sampling the image bilinearly at
    barycentric combinations of the face's UV corners.
  * create_texture_image (create_texture_image_cuda_kernel.cu via
    save_obj): per-face textures -> packed texture image + vt coords.

These run once per OBJ at dataset-build time, so they are host-side numpy
(the reference itself only runs them at load/save, never in the train
loop).
"""

from __future__ import annotations

import os

import numpy as np

from hoig_tpu.geometry.mesh import load_obj


def _barycentric_cube(tex_size: int) -> np.ndarray:
    """(T, T, T, 3) normalized barycentric weights per texel: texel
    (i, j, k) -> (i, j, k)/(i+j+k), uniform at the origin."""
    idx = np.stack(
        np.meshgrid(*([np.arange(tex_size)] * 3), indexing="ij"), axis=-1
    ).astype(np.float64)
    s = idx.sum(-1, keepdims=True)
    w = np.where(s > 0, idx / np.maximum(s, 1), 1.0 / 3.0)
    return w.astype(np.float32)


def _bilinear_sample_image(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """img (H, W, 3) float; uv (..., 2) in [0,1] (v measured from the
    bottom like OBJ vt) -> (..., 3)."""
    h, w = img.shape[:2]
    x = np.clip(uv[..., 0], 0, 1) * (w - 1)
    y = (1.0 - np.clip(uv[..., 1], 0, 1)) * (h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    return (
        img[y0, x0] * (1 - tx) * (1 - ty)
        + img[y0, x1] * tx * (1 - ty)
        + img[y1, x0] * (1 - tx) * ty
        + img[y1, x1] * tx * ty
    )


def load_textures_from_image(
    texture_img: np.ndarray, vts: np.ndarray, faces_vts: np.ndarray,
    tex_size: int = 3,
) -> np.ndarray:
    """-> (F, T, T, T, 3) float32 per-face texture cubes.

    texture_img: (H, W, 3) in [0,1] (or [0,255]; passed through).
    """
    corners = vts[faces_vts]  # (F, 3, 2)
    w = _barycentric_cube(tex_size).reshape(-1, 3)  # (T^3, 3)
    uv = np.einsum("tk,fkc->ftc", w, corners)  # (F, T^3, 2)
    tex = _bilinear_sample_image(texture_img.astype(np.float32), uv)
    f = corners.shape[0]
    return tex.reshape(f, tex_size, tex_size, tex_size, 3).astype(np.float32)


def load_obj_with_textures(obj_path: str, tex_size: int = 3):
    """nr.load_obj(load_texture=True) capability: parse OBJ + MTL map_Kd."""
    info = load_obj(obj_path)
    tex_img = None
    mtl_name = None
    with open(obj_path) as fp:
        for line in fp:
            if line.startswith("mtllib"):
                mtl_name = line.split()[1]
                break
    if mtl_name:
        mtl_path = os.path.join(os.path.dirname(obj_path), mtl_name)
        if os.path.exists(mtl_path):
            with open(mtl_path) as fp:
                for line in fp:
                    if line.strip().startswith("map_Kd"):
                        img_path = os.path.join(
                            os.path.dirname(obj_path), line.split()[-1]
                        )
                        if os.path.exists(img_path):
                            import cv2

                            tex_img = (
                                cv2.imread(img_path)[:, :, ::-1].astype(np.float32)
                                / 255.0
                            )
                        break
    if tex_img is None:
        textures = np.ones(
            (info["faces"].shape[0], tex_size, tex_size, tex_size, 3), np.float32
        )
    else:
        textures = load_textures_from_image(
            tex_img, info["vts"], info["faces_vts"], tex_size
        )
    return info, textures


def create_texture_image(textures: np.ndarray, texture_size_out: int = 16):
    """Per-face textures -> packed atlas image + per-face vt coords.

    textures: (F, T, T, T, 3). Each face gets a (tile, tile) square cell;
    inside the cell the diagonal barycentric slice of the cube is sampled
    (the packing scheme the renderer's save_obj uses: one 2-D chart per
    face). Returns (image (H, W, 3), vertices_uv (F, 3, 2) in [0, 1]).
    """
    f, t = textures.shape[0], textures.shape[1]
    tile = texture_size_out
    cols = int(np.ceil(np.sqrt(f)))
    rows = int(np.ceil(f / cols))
    img = np.zeros((rows * tile, cols * tile, 3), np.float32)
    vts = np.zeros((f, 3, 2), np.float32)

    # resample each face's cube on a (tile, tile) lower-triangle chart
    ys, xs = np.meshgrid(np.arange(tile), np.arange(tile), indexing="ij")
    a = xs / max(tile - 1, 1)
    b = ys / max(tile - 1, 1)
    w0 = np.clip(1.0 - a - b, 0.0, 1.0)
    w1 = np.clip(a, 0.0, 1.0)
    w2 = np.clip(b, 0.0, 1.0)
    s = w0 + w1 + w2
    w = np.stack([w0 / s, w1 / s, w2 / s], axis=-1)  # (tile, tile, 3)
    pos = np.clip(w * (t - 1), 0, t - 1)
    i0 = np.round(pos).astype(np.int64)  # nearest texel of the cube

    h_img = img.shape[0]
    for i in range(f):
        r, c = divmod(i, cols)
        patch = textures[i][i0[..., 0], i0[..., 1], i0[..., 2]]
        img[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile] = patch
        # face corner uvs: (0,0), (1,0), (0,1) of the cell in image coords
        x0, y0 = c * tile, r * tile
        corners_px = np.array(
            [[x0, y0], [x0 + tile - 1, y0], [x0, y0 + tile - 1]], np.float32
        )
        vts[i, :, 0] = corners_px[:, 0] / (img.shape[1] - 1)
        vts[i, :, 1] = 1.0 - corners_px[:, 1] / (h_img - 1)
    return img, vts


def save_obj_textured(path: str, vertices: np.ndarray, faces: np.ndarray,
                      textures: np.ndarray | None = None,
                      texture_size_out: int = 16) -> None:
    """save_obj with optional texture export (nr save_obj capability)."""
    base = os.path.splitext(path)[0]
    with open(path, "w") as fp:
        if textures is not None:
            fp.write(f"mtllib {os.path.basename(base)}.mtl\n")
        for v in vertices:
            fp.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if textures is None:
            for f in faces:
                fp.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
            return
        img, vts = create_texture_image(textures, texture_size_out)
        for tri in vts:
            for (u, v) in tri:
                fp.write(f"vt {u} {v}\n")
        fp.write(f"usemtl material_1\n")
        for i, f in enumerate(faces):
            t = i * 3
            fp.write(
                f"f {f[0]+1}/{t+1} {f[1]+1}/{t+2} {f[2]+1}/{t+3}\n"
            )
    with open(base + ".mtl", "w") as fp:
        fp.write("newmtl material_1\nmap_Kd {}.png\n".format(os.path.basename(base)))
    try:
        import cv2

        cv2.imwrite(base + ".png", (img[:, :, ::-1] * 255).clip(0, 255).astype(np.uint8))
    except Exception:
        pass
