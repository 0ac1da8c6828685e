"""HOGAN generator family in flax (NHWC, TPU-native).

Capability parity with HOIG_HOv3/models/networks/generator.py:
  * ResNetGenerator — bg branch encoder-bottleneck-decoder (tanh RGB).
  * ResUnetGenerator — 3-down U-net with residual bottleneck, skip convs,
    SPADE variants, and 3 regression heads (RGB/hand-attn/bg-attn).
  * Generator — 4 sub-nets (bg/obj/src/tsf); the src and tsf hand encoders
    run in lockstep and at every layer 1..n_down+repeat_num the src feature
    is warped into tsf space by the flow T (grid_sample or flow-guided
    local attention) and ADDED (generator.py:379-446).
  * ExtractorAttn — flow-guided k x k local attention
    (models/networks/extract_attn.py:8-37) built on the block-extractor op.

Reference quirks replicated on purpose (they shape what the nets learn):
  * `transform` hands ExtractorAttn a *normalized-coordinate* flow delta
    that the block extractor interprets in *pixel units*
    (generator.py:480-491 + block_extractor_kernel.cu:58-68).
  * the identity grid subtracted from T uses meshgrid 'ij' indexing, so its
    x channel varies along rows (generator.py:484-488).
  * `stn`'s grid_sample uses align_corners=False while `resize_trans`
    resizes T with align_corners=True (generator.py:466-478).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hoig_tpu.models.layers import (
    ConvINReLU,
    ResidualBlock,
    SPADEBlock,
    SPADEResidualBlock,
    UpConvINReLU,
    conv,
    conv_init,
)
from hoig_tpu.ops.grid_sample import (
    _resize_axis_linear_ac,
    grid_sample_nhwc,
)


def _resize_flow(t: jax.Array, hw: int) -> jax.Array:
    """Bilinear align_corners=True resize of (B, S, S, 2) to (B, hw, hw, 2)
    (generator.py:466-472)."""
    t = _resize_axis_linear_ac(t, 1, hw)
    return _resize_axis_linear_ac(t, 2, hw)


def _identity_grid_ij(h: int, dtype) -> jax.Array:
    """The reference's identity grid (generator.py:484-488): arange(-1,1,2/h)
    meshgrid with 'ij' indexing — x channel varies along rows (a quirk)."""
    v = -1.0 + 2.0 * jnp.arange(h, dtype=dtype) / h
    xx = jnp.broadcast_to(v[:, None], (h, h))
    yy = jnp.broadcast_to(v[None, :], (h, h))
    return jnp.stack([xx, yy], axis=-1)[None]


class ExtractorAttn(nn.Module):
    """Flow-guided local attention (extract_attn.py:8-37), fused.

    The reference materializes k^2-expanded block tensors (B, k*h, k*w, C)
    through two bespoke CUDA ops and a k-stride conv. TPU-native
    reformulation with IDENTICAL parameters and math, restructured around
    the (k+1)^2 distinct bilinear CORNERS instead of the k^2 offsets:

      * every flow-offset sample s_t shares its 4 gather corners with the
        neighboring offsets, so k^2 x 4 gathers per use collapse to
        (k+1)^2 - at k=5 that is 36 corner gathers per phase instead of
        100 (gathers, and their scatter-add transposes in the backward,
        are the HBM-bound cost on TPU; the matmuls are MXU-cheap),
      * the zero-flow target half of fc_0 (a sum over clamped integer
        shifts) is exactly a replicate-pad VALID correlation (XLA conv),
      * the fc_0 source half uses the identity (wf . G) @ W = wf . (G @ W)
        (wf is a per-pixel scalar field, the contraction is over
        channels), so each corner is gathered once, contracted against
        the <=4 offset weight slices that touch it, and discarded,
      * the output mean_t attn_t * s_t is regrouped per corner:
        sum_corner (sum_t wf attn_t) . G_corner,
      * peak memory stays O(h*w*C): no k^2 expansion, one corner live.

    All arithmetic runs in the process compute dtype (bf16 halves the
    gather traffic when enabled); softmax statistics stay in f32.

    Numerics notes (reference quirks kept):
      * flow is interpreted in pixel units (block_extractor_kernel.cu:58-68),
      * zero-flow target blocks = clamped integer shifts of `target`,
      * bilinear corners clamp to the border with unclamped weights.
    """

    kernel_size: int = 5
    # corner engine (resolved from the CLI's "auto" per precision mode,
    # environment.resolve_corner_engine): "shift" = bounded masked shifts,
    # conv-collapsed — measured FASTEST under bf16 (374 vs gather's
    # 437 ms/step, v5e); "gather" = packed per-pixel row gathers — the
    # fp32 pick; "pallas" = fused VMEM kernel (ops/attn_pallas.py),
    # opt-in (forward is 50-100x cheaper per layer, backward phases
    # still cost more than shift's XLA transpose)
    corner_engine: str = "gather"

    @nn.compact
    def __call__(self, source: jax.Array, target: jax.Array, flow: jax.Array):
        from hoig_tpu.models.layers import compute_dtype

        k = self.kernel_size
        r = k // 2
        b, h, w, c = source.shape
        cd = compute_dtype() or jnp.float32

        w0 = self.param("fc_0_kernel", conv_init, (k, k, 2 * c, 128))
        b0 = self.param("fc_0_bias", nn.initializers.zeros, (128,))
        w1 = self.param("fc_1_kernel", conv_init, (1, 1, 128, k * k))
        b1 = self.param("fc_1_bias", nn.initializers.zeros, (k * k,))
        w0c = w0.astype(cd)

        # shared bilinear footprint of the flow (pixel units, quirk kept);
        # index math in f32, weights in the compute dtype
        f32 = jnp.float32
        xf = jax.lax.broadcasted_iota(f32, (h, w), 1)
        yf = jax.lax.broadcasted_iota(f32, (h, w), 0)
        fx = flow[..., 0].astype(f32) + xf
        fy = flow[..., 1].astype(f32) + yf
        x0f = jnp.floor(fx)
        y0f = jnp.floor(fy)
        wx = {1: (fx - x0f)[..., None].astype(cd)}
        wy = {1: (fy - y0f)[..., None].astype(cd)}
        wx[0] = 1.0 - wx[1]
        wy[0] = 1.0 - wy[1]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        # fc_0 target half (shared by both engines): sum_t shift(target, t)
        # @ W_t == replicate-pad VALID correlation (one MXU conv instead of
        # k^2 shifts+matmuls)
        tpad = jnp.pad(
            target.astype(cd), ((0, 0), (r, r), (r, r), (0, 0)), mode="edge"
        )
        acc = jax.lax.conv_general_dilated(
            tpad, w0c[:, :, :c], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b0.astype(cd)

        if self.corner_engine == "shift":
            return self._shift_engine(
                source, flow, acc, w0c, w1, b1, wy, wx, x0, y0, xf, yf, cd
            )
        if self.corner_engine == "pallas":
            return self._pallas_engine(source, flow, acc, w0c, w1, b1, cd)
        return self._gather_engine(
            source, acc, w0c, w1, b1, wy, wx, x0, y0, cd
        )

    # ------------------------------------------------------------- engines
    # The flow here is the reference's normalized-coordinate delta
    # (T_scale - idt, generator.py:484-488) interpreted in pixels, so it is
    # BOUNDED: T in [-2, 1] (cal_bc_transform fills -2/-1), idt in [-1, 1)
    # => flow in [-3, 2) and floor(flow) takes only the 6 values {-3..2}
    # per axis. A per-pixel bilinear sample at flow + offset is therefore a
    # per-pixel-weighted combination of BOUNDED INTEGER SHIFTS of the
    # source — expressible as edge-padded slices + per-pixel coefficient
    # fields with no gather at all; the autodiff transpose is the opposite
    # shifts with the same fields, killing the backward scatter-adds that
    # dominated the TPU profile (PERF.md: gathers + their scatter-add VJPs
    # were the single largest non-conv cost). Exact for flow in
    # [_FLOOR_LO, _FLOOR_HI + 1); the r2 gather engine stays available for
    # hypothetical unbounded flows.
    _FLOOR_LO = -3
    _FLOOR_HI = 2

    def _shift_engine(self, source, flow, acc, w0c, w1, b1, wy, wx, x0, y0,
                      xf, yf, cd):
        k = self.kernel_size
        r = k // 2
        b, h, w, c = source.shape
        f32 = jnp.float32
        LO, HI = self._FLOOR_LO, self._FLOOR_HI
        PAD = r + HI + 1  # max |total shift| = r + HI + 1

        src_c = source.astype(cd)
        fy_rel = jnp.clip(y0 - yf.astype(jnp.int32), LO, HI)
        fx_rel = jnp.clip(x0 - xf.astype(jnp.int32), LO, HI)
        # stacked one-hot floor fields (B,h,w,6) — one vectorized compare
        # per axis instead of 6 single-channel fields
        ev = jnp.arange(LO, HI + 1)
        oh_y = (fy_rel[..., None] == ev).astype(cd)
        oh_x = (fx_rel[..., None] == ev).astype(cd)

        # per-axis bilinear coefficient STACKS (B,h,w,7): the weight a
        # sample with per-pixel floor f and frac w1 puts on integer shift
        # e is A[e] = w0 * [f == e] + w1 * [f == e - 1]; built on the
        # stacked axis (offset index e-LO in 0..6) so the whole field set
        # is 2 shifted FMAs on 7-wide tensors rather than 7 scalar-lane
        # field expressions
        nil3 = ((0, 0),) * 3
        Ay = (jnp.pad(oh_y, nil3 + ((0, 1),)) * wy[0]
              + jnp.pad(oh_y, nil3 + ((1, 0),)) * wy[1])
        Ax = (jnp.pad(oh_x, nil3 + ((0, 1),)) * wx[0]
              + jnp.pad(oh_x, nil3 + ((1, 0),)) * wx[1])
        nE = HI - LO + 2  # 7 coefficient shifts per axis

        # fc_0 source half via the conv-collapse identity: the bilinear
        # coefficient fields do not depend on the offset t, so
        #   sum_t sum_e Axy[e] * (src @ W_t)[p+t+e]
        #     = sum_e Axy[e] * G[p+e],   G = 5x5 VALID corr of the
        # edge-padded source with the source-half kernel — ONE MXU conv
        # plus 49 F-wide shifted FMAs instead of 25 projections plus
        # 25x49 FMAs (the 1225-term form measured SLOWER than the gather
        # engine on TPU and exploded XLA compile time)
        src_pad = jnp.pad(
            src_c, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)), mode="edge"
        )
        halo = HI + 1  # 3: corner shifts span [LO, HI+1] = [-3, 3]
        G = jax.lax.conv_general_dilated(
            src_pad, w0c[:, :, c:], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, h+2*halo, w+2*halo, 128): G on the corner-shift halo

        # the two weighted-shift combinations below are the engine's
        # bandwidth core. With the STACKED coefficient build above, plain
        # XLA slices+FMAs are the measured-best evaluation (280.6 ms full
        # step vs 286.2 for the r4 Pallas local_combine path on v5e, and
        # ~15 fewer minutes-each Mosaic kernel compiles); the VMEM Pallas
        # kernel (ops/local_combine) remains available via
        # HOIG_ATTN_COMBINE=pallas — it was built for (and beat) the old
        # scalar-lane field formulation, whose XLA evaluation re-read the
        # operand from HBM per fusion (29.3 ms fwd+bwd at 128px,
        # attn_ab.py).
        import os as _os

        from hoig_tpu.ops import compile_lite
        from hoig_tpu.ops.local_combine import (
            local_combine,
            local_combine_reference,
        )

        combine = (
            local_combine
            if (jax.default_backend() == "tpu" and not compile_lite()
                and _os.environ.get("HOIG_ATTN_COMBINE") == "pallas")
            else local_combine_reference
        )

        # (B, h, w, 49), offsets row-major in [-halo, halo]^2: one outer
        # product of the stacked per-axis fields
        axy_stack = (Ay[..., :, None] * Ax[..., None, :]).reshape(
            b, h, w, nE * nE
        )
        acc = acc + combine(G, axy_stack, halo).astype(acc.dtype)

        hdn = nn.leaky_relu(acc, negative_slope=0.01)
        logits = jnp.einsum("bhwf,fk->bhwk", hdn, w1[0, 0].astype(cd)) + b1.astype(cd)
        attn = nn.softmax(logits.astype(f32), axis=-1).astype(cd)

        # output half: out = mean_t attn_t * s_t regrouped per total shift
        # d: out[p] = sum_d V_d[p] * src[p + d],
        # V_(dy,dx) = sum_(ty,tx) attn_(ty,tx) * Ay[dy-ty] * Ax[dx-tx] —
        # a per-pixel 2D correlation in OFFSET space, built separably on
        # stacked offset axes: 7 shifted FMAs on (B,h,w,5,11) for the x
        # pass and 7 more on (B,h,w,11,11) for the y pass, replacing the
        # ~1000 single-channel field ops of the dict formulation (scalar
        # vector lanes were the cost: 25 ms/step of multiply_add fusions)
        nD = 2 * PAD + 1  # 11: total-shift extent per axis
        attn5 = attn.reshape(b, h, w, k, k)
        Vx = None  # (B, h, w, k, nD): sum_ex Ax[ex] attn_(ty, dx-ex)
        for exi in range(nE):
            term = Ax[..., exi, None, None] * attn5
            term = jnp.pad(term, nil3 + ((0, 0), (exi, nE - 1 - exi)))
            Vx = term if Vx is None else Vx + term
        V = None  # (B, h, w, nD, nD): sum_ey Ay[ey] Vx[(dy-ey, dx)]
        for eyi in range(nE):
            term = Ay[..., eyi, None, None] * Vx
            term = jnp.pad(term, nil3 + ((eyi, nE - 1 - eyi), (0, 0)))
            V = term if V is None else V + term
        v121 = V.reshape(b, h, w, nD * nD)
        out = combine(src_pad, v121, PAD)
        return (out.astype(cd) / (k * k)).astype(source.dtype)

    def _pallas_engine(self, source, flow, acc, w0c, w1, b1, cd):
        """Fused VMEM-resident kernel (ops/attn_pallas.py): the whole
        attention — corner sampling, fc_0 source half, softmax, weighted
        mean — runs per (batch, row-tile) out of VMEM, with a custom VJP
        that re-reads halos instead of storing 36 corner tensors and
        replaces every backward scatter-add with reverse bounded shifts.
        Exact for the HOGAN flow bound (see _FLOOR_LO/_FLOOR_HI above);
        interpret mode keeps CPU tests runnable."""
        from hoig_tpu.ops.attn_pallas import _flow_fields, flow_attention_fused

        if self.kernel_size != 5:  # kernel is specialized to k=5
            raise NotImplementedError("pallas corner engine requires k=5")
        b, h, w, c = source.shape
        if jax.default_backend() == "tpu" and c % 128:
            # Mosaic DMA lane extents must be 128-multiples; tiny configs
            # (e.g. conv_dim 8 smokes) should use the XLA engines
            raise ValueError(
                f"pallas corner engine needs channels % 128 == 0 on TPU "
                f"(got {c}); use --corner_engine gather/shift for small "
                f"conv_dim configs"
            )
        f32 = jnp.float32
        fy_rel, fx_rel, wyf, wxf = _flow_fields(flow)
        w0s = w0c[:, :, c:, :].reshape(self.kernel_size ** 2, c, 128)
        out = flow_attention_fused(
            source.astype(cd), acc.astype(f32), w0s,
            w1[0, 0].astype(f32), b1[None].astype(f32),
            fy_rel, fx_rel, wyf, wxf,
            jax.default_backend() != "tpu",
        )
        return out.astype(source.dtype)

    def _gather_engine(self, source, acc, w0c, w1, b1, wy, wx, x0, y0, cd):
        k = self.kernel_size
        r = k // 2
        b, h, w, c = source.shape
        f32 = jnp.float32
        src_flat = source.astype(cd).reshape(b, h * w, c)

        def corner(ry: int, rx: int) -> jax.Array:
            """Border-clamped gather of source at floor(flow) + (rx, ry)."""
            yc = jnp.clip(y0 + ry, 0, h - 1)
            xc = jnp.clip(x0 + rx, 0, w - 1)
            idx = (yc * w + xc).reshape(b, h * w, 1)
            return jnp.take_along_axis(src_flat, idx, axis=1)

        def offsets_touching(ry: int, rx: int):
            """The <=4 (corner-weight, offset) pairs using corner (ry, rx):
            offset (dy, dx) with bilinear corner (cy, cx) reads gather
            corner (dy+cy, dx+cx)."""
            out = []
            for cy in (0, 1):
                dy = ry - cy
                if not -r <= dy <= r:
                    continue
                for cx in (0, 1):
                    dx = rx - cx
                    if not -r <= dx <= r:
                        continue
                    out.append((cy, cx, dy + r, dx + r))
            return out

        corners = [(ry, rx) for ry in range(-r, r + 2) for rx in range(-r, r + 2)]

        # fc_0 source half: one gather per corner, stacked contraction
        for ry, rx in corners:
            ts = offsets_touching(ry, rx)
            wstk = jnp.concatenate([w0c[oy, ox, c:] for _, _, oy, ox in ts], axis=-1)
            mm = (corner(ry, rx) @ wstk).reshape(b, h, w, len(ts) * 128)
            for j, (cy, cx, _, _) in enumerate(ts):
                acc = acc + (wy[cy] * wx[cx]) * mm[..., j * 128 : (j + 1) * 128]

        hdn = nn.leaky_relu(acc, negative_slope=0.01)
        logits = jnp.einsum("bhwf,fk->bhwk", hdn, w1[0, 0].astype(cd)) + b1.astype(cd)
        attn = nn.softmax(logits.astype(f32), axis=-1).astype(cd)  # (B,h,w,k*k)

        # mean_t attn_t * s_t, regrouped per corner
        out = jnp.zeros((b, h, w, c), cd)
        for ry, rx in corners:
            cw = None
            for cy, cx, oy, ox in offsets_touching(ry, rx):
                t_idx = oy * k + ox
                term = (wy[cy] * wx[cx]) * attn[..., t_idx : t_idx + 1]
                cw = term if cw is None else cw + term
            out = out + cw * corner(ry, rx).reshape(b, h, w, c)
        return (out / (k * k)).astype(source.dtype)


# Activation rematerialization: a 16GB-HBM chip cannot hold the training
# activations of all four 512-wide sub-networks at batch 4 / 256px, so the
# conv blocks recompute their forward during the backward pass (the
# reference assumes 32GB GPUs instead). Toggleable: small-model tests on
# CPU skip it (remat slows compiles considerably).
_REMAT_CACHE = {}


def _remat(cls):
    """nn.remat, keeping the original class name so flax's auto-naming (and
    therefore every checkpoint key) is identical with and without remat —
    a remat toggle must never invalidate saved params.

    Policy: store the InstanceNorm folded stats (named 'in_stats' in
    layers.InstanceNorm) instead of recomputing their H,W reduces in the
    backward — they are (B,1,1,C) tensors, so the memory cost is nil while
    the recomputed stats reduces were ~10-15 ms/step on the TPU profile.
    Everything else is recomputed as before."""
    wrapped = nn.remat(
        cls,
        policy=jax.checkpoint_policies.save_only_these_names("in_stats"),
    )
    wrapped.__name__ = cls.__name__
    return wrapped


def _blocks(remat: bool):
    if remat not in _REMAT_CACHE:
        if remat:
            _REMAT_CACHE[remat] = {
                "res": _remat(ResidualBlock),
                "spade_res": _remat(SPADEResidualBlock),
                "conv": _remat(ConvINReLU),
                "upconv": _remat(UpConvINReLU),
                "spade_blk": _remat(SPADEBlock),
            }
        else:
            _REMAT_CACHE[remat] = {
                "res": ResidualBlock,
                "spade_res": SPADEResidualBlock,
                "conv": ConvINReLU,
                "upconv": UpConvINReLU,
                "spade_blk": SPADEBlock,
            }
    return _REMAT_CACHE[remat]


class ResNetGenerator(nn.Module):
    """Background branch (generator.py:93-135)."""

    conv_dim: int = 64
    repeat_num: int = 6
    k_size: int = 3
    n_down: int = 3
    remat: bool = True
    remat_bottleneck: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        blk = _blocks(self.remat)
        # bottleneck blocks run at 1/2^n_down resolution: their activations
        # are cheap to KEEP and expensive to recompute, so selective remat
        # (remat_bottleneck=False) skips them while the full-res encoder/
        # decoder layers stay rematerialized
        blk_mid = _blocks(self.remat and self.remat_bottleneck)
        x = blk["conv"](self.conv_dim, 7, 1, 3)(x)
        dim = self.conv_dim
        for _ in range(self.n_down):
            x = blk["conv"](dim * 2, self.k_size, 2, 1)(x)
            dim *= 2
        for _ in range(self.repeat_num):
            x = blk_mid["res"](dim)(x)
        for _ in range(self.n_down):
            x = blk["upconv"](dim // 2, self.k_size)(x)
            dim //= 2
        x = conv(3, 7, 1, 3, use_bias=False)(x)
        return jnp.tanh(x)


class ResUnetGenerator(nn.Module):
    """U-net branch with piecewise-callable stages (generator.py:138-315).

    Exposed as separate encode / bottleneck / decode / regress methods so
    `Generator` can run the src and tsf copies in lockstep with per-layer
    warping, exactly like the reference drives `.encoders[i]` directly.
    """

    conv_dim: int = 64
    repeat_num: int = 6
    k_size: int = 3
    n_down: int = 3
    spade_layers: Sequence[int] = (0, 0, 0, 0)
    on_obj: bool = False
    remat: bool = True
    remat_bottleneck: bool = True

    def setup(self):
        blk = _blocks(self.remat)
        dim = self.conv_dim
        enc = [blk["conv"](dim, 7, 1, 3)]
        for _ in range(self.n_down):
            if self.spade_layers[0]:
                enc.append(blk["spade_blk"](dim * 2, self.k_size, downsample=True))
            else:
                enc.append(blk["conv"](dim * 2, self.k_size, 2, 1))
            dim *= 2
        self.encoders = enc

        # see ResNetGenerator: bottleneck activations are 1/64 the pixels
        # of the full-res layers — selective remat keeps them
        blk_mid = _blocks(self.remat and self.remat_bottleneck)
        res = []
        for i in range(self.repeat_num):
            use_spade = (
                self.spade_layers[1]
                if i < self.repeat_num // 2
                else self.spade_layers[2]
            )
            res.append(
                blk_mid["spade_res"](dim) if use_spade else blk_mid["res"](dim)
            )
        self.resnets = res

        decs, skips = [], []
        for _ in range(self.n_down):
            if self.spade_layers[3]:
                decs.append(blk["spade_blk"](dim // 2, self.k_size, downsample=False))
            else:
                decs.append(blk["upconv"](dim // 2, self.k_size))
            skips.append(blk["conv"](dim // 2, self.k_size, 1, 1))
            dim //= 2
        self.decoders = decs
        self.skippers = skips

        self.img_reg = conv(3, 7, 1, 3, use_bias=False, name="img_reg")
        if not self.on_obj:
            self.attn_reg_hand = conv(1, 7, 1, 3, use_bias=False, name="attn_reg_hand")
            self.attn_reg_bg = conv(1, 7, 1, 3, use_bias=False, name="attn_reg_bg")

    @property
    def num_channel(self):
        """Channel width per lockstep layer index (generator.py:149,168,183,192)."""
        out = {0: self.conv_dim}
        dim = self.conv_dim
        for i in range(self.n_down):
            dim *= 2
            out[i + 1] = dim
        for i in range(self.repeat_num):
            out[i + 1 + self.n_down] = dim
        return out

    def encode_layer(self, i: int, x: jax.Array, seg: jax.Array | None):
        if i == 0:
            return self.encoders[0](x)
        if self.spade_layers[0]:
            return self.encoders[i](x, seg)
        return self.encoders[i](x)

    def resnet_layer(self, i: int, x: jax.Array, seg: jax.Array | None):
        use_spade = (
            self.spade_layers[1] if i < self.repeat_num // 2 else self.spade_layers[2]
        )
        return self.resnets[i](x, seg) if use_spade else self.resnets[i](x)

    def encode(self, x: jax.Array, seg: jax.Array | None = None):
        outs = [self.encode_layer(0, x, seg)]
        for i in range(1, self.n_down + 1):
            outs.append(self.encode_layer(i, outs[-1], seg))
        return outs

    def bottleneck(self, x: jax.Array, seg: jax.Array | None = None):
        for i in range(self.repeat_num):
            x = self.resnet_layer(i, x, seg)
        return x

    def decode(self, x: jax.Array, encoder_outs, seg: jax.Array | None = None):
        for i in range(self.n_down):
            if self.spade_layers[3]:
                x = self.decoders[i](x, seg)
            else:
                x = self.decoders[i](x)
            skip = encoder_outs[self.n_down - 1 - i]
            x = jnp.concatenate([skip, x], axis=-1)
            x = self.skippers[i](x)
        return x

    def regress(self, x: jax.Array, y: jax.Array | None = None):
        if self.on_obj:
            return jnp.tanh(self.img_reg(x))
        if self.is_initializing():
            rgb = jnp.tanh(self.img_reg(x))
            mask_hand = nn.sigmoid(self.attn_reg_hand(x))
            mask_bg = nn.sigmoid(
                self.attn_reg_bg(jnp.concatenate([x, y], axis=-1))
            )
            return rgb, mask_hand, mask_bg
        # Packed head: ONE 7x7 conv over [x, y] -> 5 channels instead of
        # three separate few-channel convs. A 7x7 conv to 3/1 outputs uses
        # 3/128 vector lanes and is pure overhead on TPU — the three head
        # convs (x2 models, + their VJPs) were ~19 ms of the 321 ms step
        # profile (PERF.md). img_reg/attn_reg_hand read only the x rows
        # (structural zero block for the y rows: exact f32-accumulated
        # zeros, so values are bit-identical and the concat VJP routes
        # each head's gradient to its own kernel). Param tree unchanged
        # (checkpoints / torch converter untouched).
        from hoig_tpu.models.layers import compute_dtype

        cd = compute_dtype() or jnp.float32
        kw_img = self.img_reg.variables["params"]["kernel"]
        kw_hand = self.attn_reg_hand.variables["params"]["kernel"]
        kw_bg = self.attn_reg_bg.variables["params"]["kernel"]
        kx = jnp.concatenate([kw_img, kw_hand], axis=-1)  # (7,7,Cx,4)
        cy = kw_bg.shape[2] - kx.shape[2]
        kx = jnp.concatenate(
            [kx, jnp.zeros(kx.shape[:2] + (cy, 4), kx.dtype)], axis=2
        )
        kw = jnp.concatenate([kx, kw_bg], axis=-1)  # (7,7,Cx+Cy,5)
        xy = jnp.concatenate([x, y], axis=-1).astype(cd)
        out = jax.lax.conv_general_dilated(
            xy, kw.astype(cd), (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (
            jnp.tanh(out[..., 0:3]),
            nn.sigmoid(out[..., 3:4]),
            nn.sigmoid(out[..., 4:5]),
        )

    def __call__(self, x: jax.Array, seg: jax.Array | None = None):
        outs = self.encode(x, seg)
        z = self.bottleneck(outs[-1], seg)
        return self.decode(z, outs, seg)


class Generator(nn.Module):
    """Full HOGAN generator (generator.py:325-464), NHWC in/out.

    Inputs mirror the reference forward: bg_inputs (B,S,S,4[+...]),
    src/tsf obj and hand RGB inputs, flow T (B,S,S,2), optional cond maps
    (SPADE variants) and armasks (HOv3).
    """

    bg_dim: int = 8
    img_dim: int = 3
    obj_dim: int = 3
    img_cond_dim: int = 0
    obj_cond_dim: int = 0
    conv_dim: int = 64
    repeat_num: int = 6
    spade_layers: Sequence[int] = (0, 0, 0, 0)
    attn_layers: Sequence[int] = ()
    n_down: int = 3
    remat: bool = True
    remat_bottleneck: bool = True
    # the attention layers' residuals (36 corner gathers each) are far
    # bigger than the conv activations; remat them independently so
    # "keep bottleneck convs, recompute attention" is expressible
    remat_attn: bool = True
    # ExtractorAttn corner engine ("gather" | "shift"), exposed for A/B
    # benchmarking (see ExtractorAttn.corner_engine)
    corner_engine: str = "gather"

    def setup(self):
        rb = self.remat_bottleneck
        self.bg_model = ResNetGenerator(
            conv_dim=self.conv_dim, repeat_num=self.repeat_num, k_size=3,
            n_down=self.n_down, remat=self.remat, remat_bottleneck=rb,
        )
        self.obj_model = ResUnetGenerator(
            conv_dim=self.conv_dim, repeat_num=self.repeat_num, k_size=3,
            n_down=self.n_down, spade_layers=self.spade_layers, on_obj=True,
            remat=self.remat, remat_bottleneck=rb,
        )
        self.src_model = ResUnetGenerator(
            conv_dim=self.conv_dim, repeat_num=self.repeat_num, k_size=3,
            n_down=self.n_down, spade_layers=self.spade_layers,
            remat=self.remat, remat_bottleneck=rb,
        )
        self.tsf_model = ResUnetGenerator(
            conv_dim=self.conv_dim, repeat_num=self.repeat_num, k_size=3,
            n_down=self.n_down, spade_layers=self.spade_layers,
            remat=self.remat, remat_bottleneck=rb,
        )
        # gated on remat_attn ALONE so "keep bottleneck convs, recompute
        # attention" (remat_bottleneck=True, remat_attn=False) is reachable;
        # the option layer (environment.py) sets both flags together when
        # --remat_bottleneck forces full remat
        attn_cls = (
            _remat(ExtractorAttn)
            if (self.remat and self.remat_attn)
            else ExtractorAttn
        )
        self.attns = {
            str(l): attn_cls(
                kernel_size=5, corner_engine=self.corner_engine, name=f"attn_{l}"
            )
            for l in self.attn_layers
        }

    def _transform(self, x, t, y=None, layer=None):
        t_scale = _resize_flow(t, x.shape[1])
        if layer is not None and layer in self.attn_layers:
            idt = _identity_grid_ij(x.shape[1], t_scale.dtype)
            flow = t_scale - idt  # quirk: normalized delta used as pixels
            return self.attns[str(layer)](x, y, flow)
        return grid_sample_nhwc(x, t_scale, align_corners=False)

    def __call__(
        self,
        bg_inputs,
        src_obj_inputs,
        tsf_obj_inputs,
        src_hand_inputs,
        tsf_hand_inputs,
        T,
        src_obj_conds=None,
        src_hand_conds=None,
        tsf_obj_conds=None,
        tsf_hand_conds=None,
        src_armask=None,
        tsf_armask=None,
    ):
        cat = lambda xs: jnp.concatenate([x for x in xs if x is not None], axis=-1)
        if src_obj_conds is None or src_hand_conds is None:
            src_bg = cat([bg_inputs, src_obj_inputs[..., 3:]])
            tsf_bg = cat([bg_inputs, tsf_hand_inputs[..., 3:]])
        else:
            src_bg = cat([bg_inputs, src_hand_conds])
            tsf_bg = cat([bg_inputs, tsf_hand_conds])
        src_bg = cat([src_bg, src_armask])
        tsf_bg = cat([tsf_bg, tsf_armask])

        # same params for both passes -> one call at 2B batch (InstanceNorm
        # is per-sample, so values are identical to two separate calls;
        # doubling the batch roughly halves the small-batch conv overhead)
        bg_both = self.bg_model(jnp.concatenate([src_bg, tsf_bg], axis=0))
        src_img_bg, tsf_img_bg = jnp.split(bg_both, 2, axis=0)

        (src_obj, src_hand, src_mask_bg, src_mask_hand,
         tsf_obj, tsf_hand, tsf_mask_bg, tsf_mask_hand) = self.infer_front(
            src_obj_inputs, tsf_obj_inputs, src_hand_inputs, tsf_hand_inputs, T,
            src_obj_conds, src_hand_conds, tsf_obj_conds, tsf_hand_conds,
        )
        return (src_img_bg, tsf_img_bg, src_obj, src_hand, src_mask_bg,
                src_mask_hand, tsf_obj, tsf_hand, tsf_mask_bg, tsf_mask_hand)

    def infer_front(
        self, src_obj_inputs, tsf_obj_inputs, src_hand_inputs, tsf_hand_inputs, T,
        src_obj_conds, src_hand_conds, tsf_obj_conds, tsf_hand_conds,
    ):
        """Two-stream lockstep encoders with per-layer warp-and-add
        (generator.py:379-446)."""
        src_x = self.src_model.encode_layer(0, src_hand_inputs, src_hand_conds)
        tsf_x = self.tsf_model.encode_layer(0, tsf_hand_inputs, tsf_hand_conds)
        src_outs, tsf_outs = [src_x], [tsf_x]

        for i in range(1, self.n_down + 1):
            src_x = self.src_model.encode_layer(i, src_x, src_hand_conds)
            tsf_x = self.tsf_model.encode_layer(i, tsf_x, tsf_hand_conds)
            tsf_x = tsf_x + self._transform(src_x, T, y=tsf_x, layer=i)
            src_outs.append(src_x)
            tsf_outs.append(tsf_x)

        for i in range(self.repeat_num):
            src_x = self.src_model.resnet_layer(i, src_x, src_hand_conds)
            tsf_x = self.tsf_model.resnet_layer(i, tsf_x, tsf_hand_conds)
            layer = i + self.n_down + 1
            tsf_x = tsf_x + self._transform(src_x, T, y=tsf_x, layer=layer)

        # obj branch shares params across src/tsf -> one 2B-batch pass
        obj_in = jnp.concatenate([src_obj_inputs, tsf_obj_inputs], axis=0)
        obj_seg = (
            None if src_obj_conds is None
            else jnp.concatenate([src_obj_conds, tsf_obj_conds], axis=0)
        )
        y_both = self.obj_model(obj_in, obj_seg)
        src_y, tsf_y = jnp.split(y_both, 2, axis=0)
        seg_dec = src_hand_conds if self.spade_layers[3] else None
        src_x = self.src_model.decode(src_x, src_outs, seg_dec)
        tsf_x = self.tsf_model.decode(
            tsf_x, tsf_outs, tsf_hand_conds if self.spade_layers[3] else None
        )
        src_hand, src_mask_hand, src_mask_bg = self.src_model.regress(src_x, src_y)
        tsf_hand, tsf_mask_hand, tsf_mask_bg = self.tsf_model.regress(tsf_x, tsf_y)
        obj_both = self.obj_model.regress(y_both)
        src_obj, tsf_obj = jnp.split(obj_both, 2, axis=0)
        return (src_obj, src_hand, src_mask_bg, src_mask_hand,
                tsf_obj, tsf_hand, tsf_mask_bg, tsf_mask_hand)
