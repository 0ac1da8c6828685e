"""Analytic FLOPs + speed-of-light table for the flagship HOGAN step.

Walks the exact layer geometry of the flagship config (generator_spade_attn
conv_dim 64 / repeat 6 / S=256 / B=4, PatchGAN-4, VGG19 loss) and prints
per-subnet conv MACs, the train-step total (fwd + 2x bwd for trained nets,
fwd-only for VGG/D-in-G where appropriate), and the implied ceiling on a
TPU v5e (197 bf16 TFLOP/s MXU peak, ~819 GB/s HBM).

This is the denominator side of PERF.md's ceiling analysis: it needs no
device and no jax — pure arithmetic from the architecture (cross-checked
against XLA cost_analysis: gen fwd 959.9 GFLOP/img measured vs analytic
below).

Reference geometry: HOIG_HOv3/models/networks/generator.py:93-315 (bg
ResNet, ResUnet), discriminator.py:8-57 (PatchGAN), vgg19.py:6-109.
"""

from __future__ import annotations

V5E_PEAK = 197e12  # bf16 MXU FLOP/s
V5E_HBM = 819e9  # bytes/s


def conv_macs(h, w, cin, cout, k, stride=1):
    return (h // stride) * (w // stride) * cin * cout * k * k


def resunet_macs(S, cd, repeat, cin, spade_layers=(1, 1, 0, 0), cond_ch=3,
                 on_obj=False, heads=True):
    """One ResUnetGenerator forward at input S with conv_dim cd."""
    m = 0
    # encoder: 7x7 cin->cd at S, then 3 stride-2 convs cd->2cd...
    m += conv_macs(S, S, cin, cd, 7)
    dim, s = cd, S
    for i in range(3):
        m += conv_macs(s, s, dim, dim * 2, 3, 2)
        if spade_layers[0]:  # SPADE on encoder: mlp_shared+gamma+beta at s/2
            m += conv_macs(s // 2, s // 2, cond_ch, 128, 3)
            m += 2 * conv_macs(s // 2, s // 2, 128, dim * 2, 3)
        dim, s = dim * 2, s // 2
    # bottleneck: repeat res blocks at s (2 convs each); first half SPADE
    for i in range(repeat):
        m += 2 * conv_macs(s, s, dim, dim, 3)
        use_spade = spade_layers[1] if i < repeat // 2 else spade_layers[2]
        if use_spade:
            for _ in range(2):
                m += conv_macs(s, s, cond_ch, 128, 3)
                m += 2 * conv_macs(s, s, 128, dim, 3)
    # decoder: 3 up-convs + skip convs
    for i in range(3):
        m += conv_macs(s, s, dim, dim // 2, 3) * 4  # transpose conv ~= k^2 at 2x res
        dim, s = dim // 2, s * 2
        m += conv_macs(s, s, dim * 2, dim, 3)  # skipper on cat(skip, x)
    if heads:
        m += conv_macs(S, S, dim, 3, 7)
        if not on_obj:
            m += 2 * conv_macs(S, S, dim, 1, 7)  # + bg head reads cat(x,y): ~2x
    return m


def resnet_macs(S, cd, repeat, cin):
    m = conv_macs(S, S, cin, cd, 7)
    dim, s = cd, S
    for _ in range(3):
        m += conv_macs(s, s, dim, dim * 2, 3, 2)
        dim, s = dim * 2, s // 2
    m += repeat * 2 * conv_macs(s, s, dim, dim, 3)
    for _ in range(3):
        m += conv_macs(s, s, dim, dim // 2, 3) * 4
        dim, s = dim // 2, s * 2
    m += conv_macs(S, S, dim, 3, 7)
    return m


def attn_macs(S, cd, n_down=3, repeat=6):
    """ExtractorAttn fc_0 (25 weight slices vs src + 5x5 corr vs tgt),
    fc_1; per attention layer, at that layer's resolution/width."""
    m = 0
    dims = []
    dim, s = cd, S
    for _ in range(n_down):
        dim, s = dim * 2, s // 2
        dims.append((s, dim))
    dims += [(s, dim)] * repeat
    for (s, c) in dims:
        m += 2 * conv_macs(s, s, c, 128, 5)  # src-half corr + tgt-half corr
        m += conv_macs(s, s, 128, 25, 1)  # fc_1
        m += s * s * 121 * c  # output FMAs (VPU, not MXU — listed separately)
    return m


def vgg19_macs(S):
    cfg = [(64, 2), ("M", 0), (128, 2), ("M", 0), (256, 4), ("M", 0),
           (512, 4), ("M", 0), (512, 4)]
    m, cin, s = 0, 3, S
    for c, n in cfg:
        if c == "M":
            s //= 2
            continue
        for _ in range(n):
            m += conv_macs(s, s, cin, c, 3)
            cin = c
    return m


def patchgan_macs(S, cin=19, ndf=64):
    m = conv_macs(S, S, cin, ndf, 4, 2)
    m += conv_macs(S // 2, S // 2, ndf, ndf * 2, 4, 2)
    m += conv_macs(S // 4, S // 4, ndf * 2, ndf * 4, 4, 2)
    m += conv_macs(S // 8, S // 8, ndf * 4, ndf * 8, 4)
    m += conv_macs(S // 8, S // 8, ndf * 8, 1, 4)
    return m


def main():
    S, B, cd, rpt = 256, 4, 64, 6
    g = {
        "bg (ResNet, 2B pass)": 2 * resnet_macs(S, cd, rpt, 9),
        "obj (ResUnet, 2B pass)": 2 * resunet_macs(S, cd, rpt, 15, cond_ch=12,
                                                   on_obj=True),
        "src hand (ResUnet)": resunet_macs(S, cd, rpt, 6),
        "tsf hand (ResUnet)": resunet_macs(S, cd, rpt, 6),
        "attention x9 (MXU part)": attn_macs(S, cd),
    }
    gen_fwd = sum(g.values())
    vgg = 2 * vgg19_macs(S)  # fake + real feature pyramids
    d_fwd = patchgan_macs(S)

    print(f"{'generator fwd MACs/img':40s} {gen_fwd/1e9:8.1f} GMAC "
          f"({2*gen_fwd/1e9:.0f} GFLOP; XLA cost_analysis measured 960)")
    for k, v in g.items():
        print(f"  {k:38s} {v/1e9:8.1f}")
    print(f"{'VGG19 fwd (2 imgs)':40s} {vgg/1e9:8.1f}")
    print(f"{'D fwd (19ch PatchGAN)':40s} {d_fwd/1e9:8.1f}")

    # train step: G fwd + G bwd(2x) ; D(fake) fwd+input-grad(2x-ish) in
    # G-step; D-step: D fwd x2 + bwd x2 (every other step, amortize 0.5)
    step_flops_img = 2 * (3 * gen_fwd + 3 * vgg + 3 * d_fwd + 0.5 * 3 * 2 * d_fwd)
    print(f"\ntrain-step FLOPs/img ~= {step_flops_img/1e12:.2f} TFLOP")
    t_mxu = step_flops_img * B / V5E_PEAK
    print(f"MXU speed-of-light @B{B}: {t_mxu*1e3:.0f} ms/step "
          f"= {B/t_mxu:.0f} img/s/chip")
    for mfu in (0.25, 0.35, 0.5):
        t = t_mxu / mfu
        print(f"  at {mfu:.0%} MFU: {t*1e3:6.0f} ms/step = {B/t:5.1f} img/s/chip")


if __name__ == "__main__":
    main()
