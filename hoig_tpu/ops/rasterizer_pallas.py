"""Pallas TPU rasterizer: tiled z-buffer with face-chunk culling.

Same semantics as hoig_tpu.ops.rasterizer (fim/wim via edge-line +
inverse-depth planes, lowest-index tie-break, vertical flip) but the
pixel-face sweep runs as a Pallas kernel over (batch, tile_y, tile_x)
programs. Each 64x64-pixel tile walks the face list in 128-face chunks and
SKIPS a chunk's entire plane evaluation when no face bbox intersects the
tile (`@pl.when`) — the data-dependent sparsity the XLA dense formulation
cannot express. With spatially coherent meshes (MANO/YCB) most
(tile, chunk) pairs are culled, so cost scales with covered area rather
than pixels x faces.

This is the TPU equivalent of the reference's CUDA
`forward_face_index_map` (rasterize_cuda_kernel.cu:86-186), replacing its
per-pixel loop over ALL faces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hoig_tpu.ops.rasterizer import _face_setup

_BIG = 1e10
# Tile shape obeys the TPU (sublane, lane) block constraints: the lane dim
# must be a multiple of 128.
TILE_H = 32
TILE_W = 128
CHUNK = 128


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


def _raster_kernel(edge_ref, izp_ref, bbox_ref, iz_out, idx_out, *, image_size,
                   n_chunks, iz_lo, iz_hi):
    """Faces ride the sublanes, pixels the lanes: the tile is processed as
    TILE_H pixel rows of (CHUNK, TILE_W) plane-evaluation blocks reduced
    over the face axis — no vector reshapes (Mosaic-friendly). The chunk
    loop is OUTER so the bbox-vs-tile cull (lax.cond) is evaluated once per
    chunk, skipping all TILE_H row blocks at once; output refs serve as the
    z-buffer accumulators (read-modify-write rows in VMEM)."""
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    s = image_size

    # lane iota: x pixel coords of this tile's row (1, TILE_W)
    xx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
    pix_x = tx.astype(jnp.float32) * TILE_W + xx
    xp = (2.0 * pix_x + 1.0 - s) / s  # (1, TILE_W)

    # tile NDC bounds (pixel centers, padded by one pixel pitch)
    pitch = 2.0 / s
    fty = ty.astype(jnp.float32)
    ftx = tx.astype(jnp.float32)
    tx0 = (2.0 * (ftx * TILE_W) + 1.0 - s) / s - pitch
    tx1 = (2.0 * (ftx * TILE_W + TILE_W - 1) + 1.0 - s) / s + pitch
    ty0 = (2.0 * (fty * TILE_H) + 1.0 - s) / s - pitch
    ty1 = (2.0 * (fty * TILE_H + TILE_H - 1) + 1.0 - s) / s + pitch

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    # init the z-buffer (iz_out doubles as the running best inverse-depth)
    iz_out[0] = jnp.full((TILE_H, TILE_W), -_BIG, jnp.float32)
    idx_out[0] = jnp.full((TILE_H, TILE_W), 2**30, jnp.int32)

    def chunk_body(c, _):
        off = c * CHUNK
        bbox = bbox_ref[0, pl.ds(off, CHUNK), :]  # (CHUNK, 4)
        overlap = (
            (bbox[:, 0:1] <= tx1)
            & (bbox[:, 1:2] >= tx0)
            & (bbox[:, 2:3] <= ty1)
            & (bbox[:, 3:4] >= ty0)
        )  # (CHUNK, 1)

        @pl.when(jnp.any(overlap))
        def _():
            edge = edge_ref[0, pl.ds(off, CHUNK), :]  # (CHUNK, 9)
            izc = izp_ref[0, pl.ds(off, CHUNK), :]  # (CHUNK, 3)

            # row-range cull: the surviving faces' y-extent usually covers
            # only part of the tile; bound the row sweep by the chunk's
            # overlap-masked y-bbox (NDC -> tile-row indices, +-1 pixel
            # pad to match the bbox pitch margin)
            ylo = jnp.min(jnp.where(overlap[:, 0], bbox[:, 2], _BIG))
            yhi = jnp.max(jnp.where(overlap[:, 0], bbox[:, 3], -_BIG))
            row0 = jnp.floor((ylo * s - 1.0 + s) * 0.5).astype(jnp.int32) - 1
            row1 = jnp.ceil((yhi * s - 1.0 + s) * 0.5).astype(jnp.int32) + 2
            tile_r0 = ty * TILE_H
            r_beg = jnp.clip(row0 - tile_r0, 0, TILE_H)
            r_end = jnp.clip(row1 - tile_r0, 0, TILE_H)

            def row_body(r, _):
                pix_y = (ty * TILE_H + r).astype(jnp.float32)
                yp = (2.0 * pix_y + 1.0 - s) / s  # scalar
                e0 = (edge[:, 0:1] * xp + (edge[:, 1:2] * yp + edge[:, 2:3])) >= 0
                e1 = (edge[:, 3:4] * xp + (edge[:, 4:5] * yp + edge[:, 5:6])) >= 0
                e2 = (edge[:, 6:7] * xp + (edge[:, 7:8] * yp + edge[:, 8:9])) >= 0
                iz = izc[:, 0:1] * pix_x + (izc[:, 1:2] * pix_y + izc[:, 2:3])
                ok = e0 & e1 & e2 & overlap & (iz > iz_lo) & (iz < iz_hi)
                iz = jnp.where(ok, iz, -_BIG)  # (CHUNK, TILE_W)
                chunk_best = jnp.max(iz, axis=0, keepdims=True)  # (1, TILE_W)
                cand = jnp.where(iz >= chunk_best, sub_iota + off, 2**30)
                chunk_arg = jnp.min(cand, axis=0, keepdims=True)
                iz_acc = iz_out[0, pl.ds(r, 1), :]
                idx_acc = idx_out[0, pl.ds(r, 1), :]
                better = (chunk_best > iz_acc) & (chunk_best > -_BIG)
                iz_out[0, pl.ds(r, 1), :] = jnp.where(better, chunk_best, iz_acc)
                idx_out[0, pl.ds(r, 1), :] = jnp.where(better, chunk_arg, idx_acc)
                return 0

            jax.lax.fori_loop(r_beg, r_end, row_body, 0)

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # background marker
    final_iz = iz_out[0]
    idx_out[0] = jnp.where(final_iz > -_BIG, idx_out[0], jnp.int32(-1))


def rasterize_fim_wim_pallas(
    face_verts: jax.Array,
    face_valid: jax.Array | None = None,
    image_size: int = 256,
    near: float = 0.1,
    far: float = 100.0,
    attrs: jax.Array | None = None,
):
    """Pallas fim/wim with the same contract as rasterize_fim_wim.

    attrs: optional (B, F+1, A) per-face attribute rows (row F = the
    background row). When given, the winner-only finish gathers
    [finv | attrs] as ONE flat row per pixel and additionally returns
    rows (B, S, S, A) — fusing the conditioning stage's fim-indexed
    encode gather (renderer.encode_and_warp) into the gather the finish
    already performs. TPU gathers are issue-rate-bound per ROW, so one
    25-float-row gather costs what the 9-float one did, and the whole
    separate encode gather disappears from the step (PERF.md r3: the
    small-lane geometry gathers were the largest non-conv bucket).
    """
    b, f = face_verts.shape[0], face_verts.shape[1]
    f_pad = -(-f // CHUNK) * CHUNK

    def prep(fv, valid):
        setup = _face_setup(fv, valid, image_size)
        keep = setup["keep"]
        x = fv[:, :, 0]
        y = fv[:, :, 1]
        big = jnp.float32(2.0)
        bbox = jnp.stack(
            [
                jnp.where(keep, jnp.min(x, -1), big),
                jnp.where(keep, jnp.max(x, -1), -big),
                jnp.where(keep, jnp.min(y, -1), big),
                jnp.where(keep, jnp.max(y, -1), -big),
            ],
            axis=-1,
        )
        edge = setup["edge"].reshape(f, 9)
        return (
            _pad_to(edge, f_pad),
            _pad_to(setup["izp"], f_pad),
            _pad_to(bbox, f_pad, fill=0.0).at[f:, 0].set(2.0).at[f:, 1].set(-2.0),
            setup["finv"],
            setup["z"],
        )

    if face_valid is None:
        face_valid = jnp.ones(face_verts.shape[:2], bool)
    edge, izp, bbox, finv, z = jax.vmap(prep)(face_verts, face_valid)

    grid = (b, image_size // TILE_H, image_size // TILE_W)
    kernel = functools.partial(
        _raster_kernel,
        image_size=image_size,
        n_chunks=f_pad // CHUNK,
        iz_lo=1.0 / far,
        iz_hi=1.0 / near,
    )
    iz, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f_pad, 9), lambda bb, ty, tx: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, 3), lambda bb, ty, tx: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad, 4), lambda bb, ty, tx: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda bb, ty, tx: (bb, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda bb, ty, tx: (bb, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, image_size, image_size), jnp.float32),
            jax.ShapeDtypeStruct((b, image_size, image_size), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * image_size * image_size * f * 10,
            bytes_accessed=b * f_pad * 16 * 4
            * (image_size // TILE_H) * (image_size // TILE_W),
            transcendentals=0,
        ),
    )(edge, izp, bbox)

    # winner-only weights + flip (same tail as the XLA path)
    from hoig_tpu.ops.table_gather import gather_rows

    s = image_size
    xi = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1).reshape(1, 1, -1)
    yi = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0).reshape(1, 1, -1)

    # batched winner gather of flat [finv(9) | attrs(A)] rows. On TPU this
    # is an MXU one-hot matmul out of VMEM (ops/table_gather) — the XLA
    # HBM row gather it replaces ran at ~30M rows/s (~14 ms/step at 2B x
    # 256^2 rows, the largest item of the geometry bucket). The background
    # row F carries zero finv (w -> 0 there anyway, masked by `hit`) and
    # the attrs background row, so no post-select is needed for rows.
    hit = idx >= 0  # (B, s, s)
    table = finv.reshape(b, -1, 9)
    if attrs is not None:
        table = jnp.concatenate([table, attrs[:, :-1]], axis=2)
    bg_row = jnp.zeros((b, 1, 9), table.dtype)
    if attrs is not None:
        bg_row = jnp.concatenate([bg_row, attrs[:, -1:]], axis=2)
    table = jnp.concatenate([table, bg_row], axis=1)  # (B, F+1, 9+A)
    f_rows = table.shape[1] - 1
    safe = jnp.where(hit, idx, f_rows).reshape(b, -1)
    fw = gather_rows(table, safe)  # (B, 9+A, N) channel-first

    w = fw[:, 0:9:3] * xi + fw[:, 1:9:3] * yi + fw[:, 2:9:3]  # (B, 3, N)
    w = jnp.clip(w, 0.0, 1.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    hit_flat = hit.reshape(b, 1, -1)
    fim = jnp.where(hit, idx, -1)[:, ::-1]
    wim = jnp.where(hit_flat, w, 0.0).transpose(0, 2, 1)
    wim = wim.reshape(b, s, s, 3)[:, ::-1]
    if attrs is None:
        return fim, wim
    rows = fw[:, 9:].transpose(0, 2, 1).reshape(b, s, s, -1)[:, ::-1]
    return fim, wim, rows


def rasterize_fim_wim_auto(
    face_verts: jax.Array,
    face_valid: jax.Array | None = None,
    image_size: int = 256,
    near: float = 0.1,
    far: float = 100.0,
    attrs: jax.Array | None = None,
):
    """Backend-dispatched fim/wim: the Pallas tiled kernel on TPU (2.3x the
    XLA path on compact HOI scenes at real YCB face counts), the XLA chunked
    reduction elsewhere (CPU tests, odd image sizes).

    With `attrs` (B, F+1, A; row F = background) additionally returns the
    per-pixel attribute rows (B, S, S, A) — on TPU fused into the finish
    gather (see rasterize_fim_wim_pallas), elsewhere an equivalent
    separate take_along_axis (bit-identical to renderer.encode_and_warp's
    fetch: fim < 0 resolves to the background row)."""
    from hoig_tpu.ops.rasterizer import rasterize_fim_wim

    from hoig_tpu.ops import compile_lite

    use_pallas = (
        jax.default_backend() == "tpu"
        and not compile_lite()
        and image_size % TILE_H == 0
        and image_size % TILE_W == 0
    )
    if use_pallas:
        return rasterize_fim_wim_pallas(
            face_verts, face_valid, image_size=image_size, near=near, far=far,
            attrs=attrs,
        )
    out = rasterize_fim_wim(
        face_verts, face_valid, image_size=image_size, near=near, far=far
    )
    if attrs is None:
        return out
    fim, wim = out
    b, s1, s2 = fim.shape
    f_max = attrs.shape[1] - 1
    idx = jnp.where(fim < 0, f_max, fim).reshape(b, s1 * s2, 1)
    rows = jnp.take_along_axis(attrs, idx, axis=1).reshape(b, s1, s2, -1)
    return fim, wim, rows
