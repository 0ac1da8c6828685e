"""Generic renderer object API (neural_renderer `Renderer`/`Mesh` parity).

The reference vendors a general-purpose differentiable renderer whose
object API (thirdparty/neural_renderer/neural_renderer/{renderer,mesh}.py)
wraps the same kernels MANORenderer uses. This module provides the same
surface over the TPU-native ops for users who consumed nr directly:

  Mesh      — vertices/faces/textures container with OBJ IO.
  Renderer  — perspective/look_at camera + lighting + rasterize entry
              points: render_rgb / render_depth / render_silhouettes.

All methods are functional underneath (jit-compatible); the classes only
hold static configuration and buffers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hoig_tpu.geometry.obj_io import load_obj_with_textures, save_obj_textured
from hoig_tpu.geometry.projection import look_at as look_at_fn
from hoig_tpu.geometry.projection import vertices_to_faces
from hoig_tpu.ops.grid_sample import avg_pool
from hoig_tpu.ops.rasterizer import (
    rasterize_depth,
    rasterize_fim_wim,
    rasterize_silhouette,
    soft_silhouette,
)
from hoig_tpu.ops.rasterizer_grad import (
    DEFAULT_EPS,
    rasterize_depth_exact,
    rasterize_silhouette_exact,
    render_rgb_exact,
)
from hoig_tpu.ops.texture import lighting as apply_lighting
from hoig_tpu.ops.texture import sample_textures_trilinear


@dataclasses.dataclass
class Mesh:
    """Vertices/faces/textures container (nr Mesh capability)."""

    vertices: jnp.ndarray  # (V, 3) or (B, V, 3)
    faces: jnp.ndarray  # (F, 3) int32
    textures: jnp.ndarray | None = None  # (F, T, T, T, 3)

    @classmethod
    def from_obj(cls, path: str, load_texture: bool = False, tex_size: int = 3):
        info, textures = load_obj_with_textures(path, tex_size)
        return cls(
            vertices=jnp.asarray(info["vertices"]),
            faces=jnp.asarray(info["faces"]),
            textures=jnp.asarray(textures) if load_texture else None,
        )

    def save_obj(self, path: str, texture_size_out: int = 16):
        save_obj_textured(
            path,
            np.asarray(self.vertices if self.vertices.ndim == 2 else self.vertices[0]),
            np.asarray(self.faces),
            None if self.textures is None else np.asarray(self.textures),
            texture_size_out,
        )

    def batched(self):
        v = self.vertices if self.vertices.ndim == 3 else self.vertices[None]
        t = None
        if self.textures is not None:
            t = self.textures if self.textures.ndim == 6 else self.textures[None]
        return v, self.faces, t


@dataclasses.dataclass
class Renderer:
    """nr Renderer capability: camera + lighting + rasterization config."""

    image_size: int = 256
    anti_aliasing: bool = True
    background_color: tuple = (0.0, 0.0, 0.0)
    viewing_angle: float = 30.0
    eye: tuple | None = None
    camera_direction: tuple = (0.0, 0.0, 1.0)
    near: float = 0.1
    far: float = 100.0
    light_intensity_ambient: float = 0.5
    light_intensity_directional: float = 0.5
    light_color_ambient: tuple = (1.0, 1.0, 1.0)
    light_color_directional: tuple = (1.0, 1.0, 1.0)
    light_direction: tuple = (0.0, 1.0, 0.0)

    def _eye(self):
        if self.eye is not None:
            return self.eye
        return (0.0, 0.0, -(1.0 / np.tan(np.radians(self.viewing_angle)) + 1.0))

    def _view_faces(self, vertices, faces):
        verts_view = look_at_fn(vertices, self._eye())
        return vertices_to_faces(verts_view, faces)

    def render_silhouettes(self, vertices, faces, soft: bool = False,
                           exact_grad: bool = False):
        """Coverage mask. Three gradient modes:
          default     — hard forward, no vertex gradients (HOGAN's use),
          soft=True   — sigmoid soft coverage, plain autodiff,
          exact_grad  — hard forward + the reference backward_pixel_map
                        edge-walk VJP (rasterize_cuda_kernel.cu:263-521).
        """
        fv = self._view_faces(vertices, faces)
        if soft:
            return soft_silhouette(fv, image_size=self.image_size)
        s = self.image_size * (2 if self.anti_aliasing else 1)
        if exact_grad:
            valid = jnp.ones(fv.shape[:2], jnp.float32)
            sil = rasterize_silhouette_exact(fv, valid, s, self.near, self.far)
        else:
            sil = rasterize_silhouette(fv, image_size=s, near=self.near, far=self.far)
        if self.anti_aliasing:
            sil = avg_pool(sil[:, None], 2)[:, 0]
        return sil

    def render_depth(self, vertices, faces, exact_grad: bool = False):
        fv = self._view_faces(vertices, faces)
        if exact_grad:
            valid = jnp.ones(fv.shape[:2], jnp.float32)
            return rasterize_depth_exact(
                fv, valid, self.image_size, self.near, self.far
            )
        return rasterize_depth(
            fv, image_size=self.image_size, near=self.near, far=self.far
        )

    def render(self, vertices, faces, textures, get_fim: bool = False,
               exact_grad: bool = False):
        """RGB render: lighting -> rasterize (2x AA) -> texture sampling.

        exact_grad=True routes through the custom-VJP path whose backward
        matches the reference RasterizeFunction: grad->textures via the
        sampling weights, grad->vertices via the edge-walking pixel map
        (no vertex gradient through the barycentric weights)."""
        if exact_grad:
            world_fv = vertices_to_faces(vertices, faces)
            lit = apply_lighting(
                world_fv, textures,
                self.light_intensity_ambient, self.light_intensity_directional,
                self.light_color_ambient, self.light_color_directional,
                self.light_direction,
            )
            fv = self._view_faces(vertices, faces)
            s = self.image_size * (2 if self.anti_aliasing else 1)
            valid = jnp.ones(fv.shape[:2], jnp.float32)
            rgb = render_rgb_exact(
                fv, lit, valid, s, self.near, self.far, 128, DEFAULT_EPS,
                self.background_color,
            )
            rgb = rgb.transpose(0, 3, 1, 2)
            if self.anti_aliasing:
                rgb = avg_pool(rgb, 2)
            if get_fim:
                fim_out, _ = rasterize_fim_wim(
                    fv, image_size=self.image_size, near=self.near, far=self.far
                )
                return rgb, fim_out
            return rgb
        return self._render_plain(vertices, faces, textures, get_fim)

    def _render_plain(self, vertices, faces, textures, get_fim: bool = False):
        """RGB render: lighting -> rasterize (2x AA) -> texture sampling."""
        world_fv = vertices_to_faces(vertices, faces)
        lit = apply_lighting(
            world_fv,
            textures,
            self.light_intensity_ambient,
            self.light_intensity_directional,
            self.light_color_ambient,
            self.light_color_directional,
            self.light_direction,
        )
        fv = self._view_faces(vertices, faces)
        s = self.image_size * (2 if self.anti_aliasing else 1)
        fim, wim = rasterize_fim_wim(fv, image_size=s, near=self.near, far=self.far)
        rgb = sample_textures_trilinear(lit, fim, wim, self.background_color)
        rgb = rgb.transpose(0, 3, 1, 2)
        if self.anti_aliasing:
            rgb = avg_pool(rgb, 2)
        if get_fim:
            fim_out, _ = rasterize_fim_wim(
                fv, image_size=self.image_size, near=self.near, far=self.far
            )
            return rgb, fim_out
        return rgb

    def render_mesh(self, mesh: Mesh, mode: str = "rgb"):
        v, f, t = mesh.batched()
        if mode == "silhouettes":
            return self.render_silhouettes(v, f)
        if mode == "depth":
            return self.render_depth(v, f)
        if t is None:
            t = jnp.ones(
                (v.shape[0], f.shape[0], 3, 3, 3, 3), jnp.float32
            )
        return self.render(v, f, t)
