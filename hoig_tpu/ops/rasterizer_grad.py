"""Exact rasterizer vertex gradients (neural_renderer backward parity).

The reference ships three backward kernels
(HOIG_HOv3/thirdparty/neural_renderer/neural_renderer/cuda/
rasterize_cuda_kernel.cu):

  backward_pixel_map  (:263-521) — edge-walking approximate vertex x/y
      gradients for the silhouette (alpha) and RGB maps: for every face
      edge, for both walk axes, pixels inside/outside the edge contribute
      grad = -(color difference · upstream grad) / (distance the edge must
      move to flip that pixel), accumulated on the edge's two endpoints.
  backward_textures   (:524-559) — grad_rgb scattered into texture texels
      through the saved trilinear sampling weights.
  backward_depth_map  (:561-611) — analytic perspective-depth derivative
      through the clamped barycentric weights.

HOGAN itself never backprops through rasterization (conditioning runs
under no_grad, models/trainer.py:326); these exist for the generic
renderer API. TPU-native formulation: instead of the CUDA one-thread-per-
face dynamic edge walk, the walk is vectorized over (face, edge, axis)
lanes and the full transverse pixel line, with one `lax.fori_loop` over
the along-edge coordinate — all shapes static, reductions on the VPU.
`backward_textures` needs no custom code: the forward sampling is a
differentiable gather, so XLA autodiff produces exactly that scatter
(deterministically, vs the reference's atomicAdd).

Everything here operates in the UNFLIPPED raster frame (row r = iota row
r); the public custom-vjp wrappers in `rasterizer.py`/`texture.py` flip
maps and cotangents at the boundary like the forward does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hoig_tpu.ops.rasterizer import _face_setup

DEFAULT_EPS = 1e-4  # reference rasterize.py:12


def backward_pixel_map(
    face_verts: jax.Array,
    face_valid: jax.Array | None,
    fim: jax.Array,
    alpha: jax.Array | None,
    grad_alpha: jax.Array | None,
    rgb: jax.Array | None,
    grad_rgb: jax.Array | None,
    image_size: int,
    eps: float = DEFAULT_EPS,
) -> jax.Array:
    """Edge-walk vertex gradients, batched.

    face_verts: (B, F, 3, 3) NDC; fim: (B, S, S) int32 (UNflipped);
    alpha/grad_alpha: (B, S, S) or None; rgb/grad_rgb: (B, S, S, 3) or
    None. Returns grad_faces (B, F, 3, 3) with zero z-component
    (rasterize_cuda_kernel.cu:263-521 semantics).
    """
    fn = functools.partial(
        _bpm_single, image_size=image_size, eps=eps,
        use_alpha=alpha is not None, use_rgb=rgb is not None,
    )
    b, f = face_verts.shape[:2]
    s = image_size
    zeros2 = jnp.zeros((b, s, s), jnp.float32)
    zeros3 = jnp.zeros((b, s, s, 3), jnp.float32)
    valid = (
        jnp.ones((b, f), bool) if face_valid is None else face_valid
    )
    return jax.vmap(fn)(
        face_verts.astype(jnp.float32),
        valid,
        fim,
        alpha if alpha is not None else zeros2,
        grad_alpha if grad_alpha is not None else zeros2,
        rgb if rgb is not None else zeros3,
        grad_rgb if grad_rgb is not None else zeros3,
    )


def _bpm_single(fv, valid, fim, alpha, g_alpha, rgb, g_rgb, *,
                image_size, eps, use_alpha, use_rgb):
    """One batch element. fv (F,3,3); maps (S,S[,3]) unflipped."""
    s = image_size
    F = fv.shape[0]
    x, y, z = fv[:, :, 0], fv[:, :, 1], fv[:, :, 2]

    # front-face test, kernel :288-289 (skip if strictly backfacing)
    front = (y[:, 2] - y[:, 0]) * (x[:, 1] - x[:, 0]) >= (
        (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0])
    )
    lane_ok = front & valid  # (F,)

    # pixel coords pp (kernel :297-300)
    px = 0.5 * (x * s + s - 1.0)  # (F, 3)
    py = 0.5 * (y * s + s - 1.0)

    # lanes: (F, 3 edges, 2 axes). p[num][0] = pp[num][axis],
    # p[num][1] = pp[num][1-axis]  (kernel :306-311 index arithmetic).
    e_idx = jnp.arange(3)
    pi0, pi1, pi2 = e_idx, (e_idx + 1) % 3, (e_idx + 2) % 3
    take = lambda arr, idx: arr[:, idx]  # (F,3) by edge
    # coords per edge endpoint: shape (F, 3, 2, 2) = [edge, axis, (d0,d1)]
    def coords(idx):
        cx, cy = take(px, idx), take(py, idx)  # (F, 3)
        a0 = jnp.stack([cx, cy], axis=-1)  # axis=0: (d0,d1)=(x,y)
        a1 = jnp.stack([cy, cx], axis=-1)  # axis=1: (d0,d1)=(y,x)
        return jnp.stack([a0, a1], axis=2)  # (F, 3, 2, 2)

    P0, P1, P2 = coords(pi0), coords(pi1), coords(pi2)
    p00, p01 = P0[..., 0], P0[..., 1]  # (F, 3, 2)
    p10, p11 = P1[..., 0], P1[..., 1]
    p20, p21 = P2[..., 0], P2[..., 1]

    # direction (kernel :315-326): axis 0 -> -1 if p00<p10 else +1; axis 1
    # flips the sign convention.
    lt = p00 < p10  # (F, 3, 2)
    sign_by_axis = jnp.array([[-1.0, 1.0], [1.0, -1.0]], jnp.float32)
    direction = jnp.where(lt, sign_by_axis[0], sign_by_axis[1])  # (F,3,2)

    d0_from = jnp.maximum(jnp.ceil(jnp.minimum(p00, p10)), 0.0)
    # C int-cast truncates toward zero (matters only for off-screen faces)
    d0_to = jnp.trunc(jnp.minimum(jnp.maximum(p00, p10), s - 1.0))

    slope = (p11 - p01) / jnp.where(p10 == p00, jnp.inf, p10 - p00)

    d1_axis = jnp.arange(s, dtype=jnp.float32)  # transverse coordinate

    def body(d0i, acc):
        d0 = d0i.astype(jnp.float32)
        active = lane_ok[:, None, None] & (d0 >= d0_from) & (d0 <= d0_to)

        d1_cross = slope * (d0 - p00) + p01  # (F, 3, 2)
        d1_in = jnp.where(
            direction > 0, jnp.floor(d1_cross), jnp.ceil(d1_cross)
        )
        d1_out = d1_in + direction
        inb = (d1_in >= 0) & (d1_in < s) & (d1_out >= 0) & (d1_out < s)
        ok = active & inb & jnp.isfinite(d1_cross)

        # transverse lines at this d0 for both axes:
        # axis 0: column d0 (values over rows); axis 1: row d0.
        col_a = jax.lax.dynamic_index_in_dim(alpha, d0i, 1, keepdims=False)
        row_a = jax.lax.dynamic_index_in_dim(alpha, d0i, 0, keepdims=False)
        col_ga = jax.lax.dynamic_index_in_dim(g_alpha, d0i, 1, keepdims=False)
        row_ga = jax.lax.dynamic_index_in_dim(g_alpha, d0i, 0, keepdims=False)
        col_f = jax.lax.dynamic_index_in_dim(fim, d0i, 1, keepdims=False)
        row_f = jax.lax.dynamic_index_in_dim(fim, d0i, 0, keepdims=False)
        lineA = jnp.stack([col_a, row_a])  # (2, S)
        lineGA = jnp.stack([col_ga, row_ga])
        lineF = jnp.stack([col_f, row_f])  # (2, S) int
        if use_rgb:
            col_r = jax.lax.dynamic_index_in_dim(rgb, d0i, 1, keepdims=False)
            row_r = jax.lax.dynamic_index_in_dim(rgb, d0i, 0, keepdims=False)
            col_gr = jax.lax.dynamic_index_in_dim(g_rgb, d0i, 1, keepdims=False)
            row_gr = jax.lax.dynamic_index_in_dim(g_rgb, d0i, 0, keepdims=False)
            lineR = jnp.stack([col_r, row_r])  # (2, S, 3)
            lineGR = jnp.stack([col_gr, row_gr])

        # gather in/out pixel values per lane: index (axis, d1)
        ax = jnp.broadcast_to(jnp.arange(2)[None, None, :], d1_in.shape)
        i_in = jnp.clip(d1_in.astype(jnp.int32), 0, s - 1)
        i_out = jnp.clip(d1_out.astype(jnp.int32), 0, s - 1)
        a_in = lineA[ax, i_in]  # (F, 3, 2)
        a_out = lineA[ax, i_out]
        f_in = lineF[ax, i_in]
        face_ids = jnp.broadcast_to(
            jnp.arange(F, dtype=fim.dtype)[:, None, None], d1_in.shape
        )
        is_in_fn = ok & (f_in == face_ids)
        if use_rgb:
            r_in = lineR[ax, i_in]  # (F, 3, 2, 3)
            r_out = lineR[ax, i_out]

        # ---- OUT side walk: d1 from d1_out to the image border, gated by
        # the in-pixel belonging to this face (kernel :373-431).
        d1v = d1_axis[None, None, None, :]  # (1,1,1,S)
        d1_limit_o = jnp.where(direction > 0, s - 1.0, 0.0)
        lo_o = jnp.minimum(d1_out, d1_limit_o)[..., None]
        hi_o = jnp.maximum(d1_out, d1_limit_o)[..., None]
        in_rng_o = (d1v >= lo_o) & (d1v <= hi_o)
        diff_o = (lineA[ax] - a_in[..., None]) * lineGA[ax]  # (F,3,2,S)
        if use_rgb:
            diff_o = diff_o + jnp.sum(
                (lineR[ax] - r_in[..., None, :]) * lineGR[ax], axis=-1
            )
        m_o = is_in_fn[..., None] & in_rng_o & (diff_o > 0)

        # ---- IN side walk: d1 from d1_in to the third-edge crossing,
        # gated per pixel on fim == fn (kernel :434-516).
        straddles = (d0 - p00) * (d0 - p20) < 0
        cross02 = (p21 - p01) / jnp.where(
            p20 == p00, jnp.inf, p20 - p00
        ) * (d0 - p00) + p01
        cross12 = (p11 - p21) / jnp.where(
            p10 == p20, jnp.inf, p10 - p20
        ) * (d0 - p20) + p21
        d0_cross2 = jnp.where(straddles, cross02, cross12)
        d1_limit_i = jnp.where(
            direction > 0, jnp.ceil(d0_cross2), jnp.floor(d0_cross2)
        )
        lo_i = jnp.maximum(jnp.minimum(d1_in, d1_limit_i), 0.0)[..., None]
        hi_i = jnp.minimum(jnp.maximum(d1_in, d1_limit_i), s - 1.0)[..., None]
        in_rng_i = (d1v >= lo_i) & (d1v <= hi_i)
        pix_is_fn = lineF[ax] == face_ids[..., None]
        diff_i = (lineA[ax] - a_out[..., None]) * lineGA[ax]
        if use_rgb:
            diff_i = diff_i + jnp.sum(
                (lineR[ax] - r_out[..., None, :]) * lineGR[ax], axis=-1
            )
        m_i = (
            ok[..., None] & pix_is_fn & in_rng_i
            & (diff_i > 0) & jnp.isfinite(d0_cross2)[..., None]
        )

        # ---- distance denominators (kernel :421-430, :503-512), shared
        # by both walks; accumulate -diff/dist on the two edge endpoints.
        rel = d1v - d1_cross[..., None]  # (F,3,2,S)
        base = (p10 - p00)[..., None]
        dist0 = base / (p10 - d0)[..., None] * rel * (2.0 / s)
        dist1 = base / (d0 - p00)[..., None] * rel * (2.0 / s)
        dist0 = jnp.where(dist0 > 0, dist0 + eps, dist0 - eps)
        dist1 = jnp.where(dist1 > 0, dist1 + eps, dist1 - eps)
        ok0 = (p10 != d0)[..., None]
        ok1 = (p00 != d0)[..., None]

        m = jnp.stack([m_o, m_i])  # (2, F, 3, 2, S)
        diff = jnp.stack([diff_o, diff_i])
        g0 = -jnp.sum(
            jnp.where(m & ok0[None], diff / dist0[None], 0.0), axis=(0, -1)
        )  # (F, 3, 2)
        g1 = -jnp.sum(
            jnp.where(m & ok1[None], diff / dist1[None], 0.0), axis=(0, -1)
        )
        return acc + jnp.stack([g0, g1], axis=-1)  # (F, 3, 2, 2)

    acc = jax.lax.fori_loop(
        0, s, body, jnp.zeros((F, 3, 2, 2), jnp.float32)
    )

    # fold lanes back onto vertex coordinates: lane (edge e, axis a)
    # endpoint 0 -> vertex e, endpoint 1 -> vertex (e+1)%3, coordinate 1-a.
    gxy = jnp.zeros((F, 3, 2), jnp.float32)
    for a in range(2):
        c = 1 - a
        gxy = gxy.at[:, :, c].add(acc[:, :, a, 0])
        gxy = gxy.at[:, jnp.asarray([1, 2, 0]), c].add(acc[:, :, a, 1])
    return jnp.concatenate([gxy, jnp.zeros((F, 3, 1), jnp.float32)], axis=-1)


def backward_depth_map(
    face_verts: jax.Array,
    face_valid: jax.Array | None,
    fim: jax.Array,
    depth: jax.Array,
    grad_depth: jax.Array,
    image_size: int,
) -> jax.Array:
    """Analytic depth-map vertex gradients (kernel :561-611), batched.

    All maps UNflipped. Uses the same face_inv/weights as the forward
    (recomputed — deterministic). Returns grad_faces (B, F, 3, 3).
    """
    b, f = face_verts.shape[:2]
    s = image_size

    def one(fv, valid, fim1, d1, gd1):
        setup = _face_setup(fv, valid, s)
        finv, zc = setup["finv"], setup["z"]  # (F,3,3), (F,3)

        hit = (fim1 >= 0).reshape(-1)
        idx = jnp.clip(fim1.reshape(-1), 0)  # (P,)
        finv_w = finv[idx]  # (P, 3, 3)
        z_w = zc[idx]  # (P, 3)

        xi = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1).reshape(-1)
        yi = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0).reshape(-1)
        w = (
            finv_w[:, :, 0] * xi[:, None]
            + finv_w[:, :, 1] * yi[:, None]
            + finv_w[:, :, 2]
        )
        w = jnp.clip(w, 0.0, 1.0)
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)

        dp = d1.reshape(-1)
        g = jnp.where(hit, gd1.reshape(-1), 0.0)
        d2 = dp * dp

        # dz_k: g * w_k * d^2 / z_k^2   (kernel :592-595)
        safe_z = jnp.where(jnp.abs(z_w) < 1e-12, 1e-12, z_w)
        gz = g[:, None] * w * d2[:, None] / (safe_z * safe_z)  # (P, 3)

        # dx/dy: -g * tmp_l * w_k * d^2 * s/2, tmp_l = -sum_k finv[k,l]/z_k
        tmp = -jnp.sum(finv_w / safe_z[:, :, None], axis=1)  # (P, 3)
        gxyk = (
            -g[:, None, None]
            * tmp[:, None, :2]
            * w[:, :, None]
            * d2[:, None, None]
            * (s / 2.0)
        )  # (P, 3 verts, 2)

        contrib = jnp.concatenate([gxyk, gz[:, :, None]], axis=-1)  # (P,3,3)
        seg = jnp.where(hit, idx, f)  # padded segment for misses
        out = jax.ops.segment_sum(contrib, seg, num_segments=f + 1)
        return out[:f]

    valid = jnp.ones((b, f), bool) if face_valid is None else face_valid
    return jax.vmap(one)(face_verts.astype(jnp.float32), valid, fim, depth, grad_depth)


# --------------------------------------------------------------------------
# custom_vjp entry points: hard forward maps + reference backward semantics.
# face_valid is carried as a float mask (1/0) so every primal is
# differentiable-typed; its cotangent is zero.
# --------------------------------------------------------------------------


def _unflip(m):
    return m[:, ::-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def rasterize_silhouette_exact(
    face_verts, valid_f, image_size=256, near=0.1, far=100.0, chunk=128,
    eps=DEFAULT_EPS,
):
    """Hard silhouette whose VJP is the reference backward_pixel_map
    (alpha-only). valid_f: (B, F) float 1/0 mask (use jnp.ones for none)."""
    sil, _ = _sil_fwd_res(face_verts, valid_f, image_size, near, far, chunk)
    return sil


def _sil_fwd_res(face_verts, valid_f, image_size, near, far, chunk):
    from hoig_tpu.ops.rasterizer import rasterize_fim_wim

    fim, _ = rasterize_fim_wim(
        face_verts, valid_f > 0.5, image_size=image_size, near=near, far=far,
        chunk=chunk,
    )
    sil = (fim >= 0).astype(jnp.float32)
    return sil, (face_verts, valid_f, _unflip(fim), _unflip(sil))


def _sil_fwd(face_verts, valid_f, image_size, near, far, chunk, eps):
    sil, res = _sil_fwd_res(face_verts, valid_f, image_size, near, far, chunk)
    return sil, res


def _sil_bwd(image_size, near, far, chunk, eps, res, g):
    face_verts, valid_f, fim_u, sil_u = res
    grad_faces = backward_pixel_map(
        face_verts, valid_f > 0.5, fim_u,
        alpha=sil_u, grad_alpha=_unflip(g), rgb=None, grad_rgb=None,
        image_size=image_size, eps=eps,
    )
    return grad_faces, jnp.zeros_like(valid_f)


rasterize_silhouette_exact.defvjp(_sil_fwd, _sil_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rasterize_depth_exact(
    face_verts, valid_f, image_size=256, near=0.1, far=100.0, chunk=128
):
    """Depth map whose VJP is the reference backward_depth_map."""
    d, _ = _depth_fwd(face_verts, valid_f, image_size, near, far, chunk)
    return d


def _depth_fwd(face_verts, valid_f, image_size, near, far, chunk):
    from hoig_tpu.ops.rasterizer import _rasterize_single

    fn = functools.partial(
        _rasterize_single, image_size=image_size, near=near, far=far,
        chunk=chunk,
    )
    fim, _, dim = jax.vmap(fn)(face_verts, valid_f > 0.5)
    return dim, (face_verts, valid_f, _unflip(fim), _unflip(dim))


def _depth_bwd(image_size, near, far, chunk, res, g):
    face_verts, valid_f, fim_u, dim_u = res
    grad_faces = backward_depth_map(
        face_verts, valid_f > 0.5, fim_u, dim_u, _unflip(g), image_size
    )
    return grad_faces, jnp.zeros_like(valid_f)


rasterize_depth_exact.defvjp(_depth_fwd, _depth_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def render_rgb_exact(
    face_verts, textures, valid_f, image_size=256, near=0.1, far=100.0,
    chunk=128, eps=DEFAULT_EPS, background_color=(0.0, 0.0, 0.0),
):
    """RGB render (texture sampling over the hard rasterization) whose VJP
    matches the reference RasterizeFunction backward: grad->textures via
    the sampling weights (backward_textures), grad->vertex x/y via the
    edge-walking pixel map; sampling weights carry NO vertex gradient
    (rasterize.py:102-160 treats weight_map as a saved buffer)."""
    rgb, _ = _rgb_fwd(
        face_verts, textures, valid_f, image_size, near, far, chunk, eps,
        background_color,
    )
    return rgb


def _rgb_fwd(face_verts, textures, valid_f, image_size, near, far, chunk,
             eps, background_color):
    from hoig_tpu.ops.rasterizer import rasterize_fim_wim

    fim, wim = rasterize_fim_wim(
        face_verts, valid_f > 0.5, image_size=image_size, near=near, far=far,
        chunk=chunk,
    )
    from hoig_tpu.ops.texture import sample_textures_trilinear

    rgb = sample_textures_trilinear(textures, fim, wim, background_color)
    res = (face_verts, textures, valid_f, fim, wim, rgb)
    return rgb, res


def _rgb_bwd(image_size, near, far, chunk, eps, background_color, res, g):
    face_verts, textures, valid_f, fim, wim, rgb = res
    from hoig_tpu.ops.texture import sample_textures_trilinear

    # textures: autodiff of the sampling gather == backward_textures
    _, pull = jax.vjp(
        lambda tex: sample_textures_trilinear(tex, fim, wim, background_color),
        textures,
    )
    (grad_tex,) = pull(g)

    # vertices: edge-walking pixel map on the UNflipped rgb maps
    grad_faces = backward_pixel_map(
        face_verts, valid_f > 0.5, _unflip(fim),
        alpha=None, grad_alpha=None,
        rgb=_unflip(rgb), grad_rgb=_unflip(g),
        image_size=image_size, eps=eps,
    )
    return grad_faces, grad_tex, jnp.zeros_like(valid_f)


render_rgb_exact.defvjp(_rgb_fwd, _rgb_bwd)
