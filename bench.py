"""Throughput benchmark: 256x256 HOGAN, one JSON line on stdout.

Headline metric (stable across rounds): full GAN train-step
images/sec/chip at 256x256, flagship config (generator_spade_attn,
conv_dim 64, repeat 6, SPADE + 9 flow-guided attention layers, PatchGAN-4,
full loss set, conditioning fused into the step), bf16 compute with
selective remat — the production configuration that environment.py
auto-selects under --bf16 and that scripts/train_hov3_ddp.sh drives.
Numerical parity argument: all losses and optimizer state stay f32
(trainer.py losses-in-f32), and the selective-remat path is
equivalence-tested against no-remat (tests/test_trainer.py). The fp32
step is reported as a diagnostic leg.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md);
the baseline here is an ESTIMATE, derived — not guessed — as:

    est. A100 img/s  =  (TF32 peak 156 TFLOP/s x 30% utilization)
                        / (model FLOPs per image)

where model FLOPs per image come from XLA's cost analysis of the
generator-forward program (forward-only; the train step is ~3x that, and
the same x3 cancels in the ratio). 30% is a deliberately GENEROUS
utilization for the reference's eager per-sample-python pipeline
(models/trainer.py:63-97 runs conditioning in a python loop per sample);
the true reference number must be measured on an A100 to replace this.
The vs_baseline DENOMINATOR IS FROZEN at A100_EST_IMG_S = 16.25 (the r1
derivation) in BOTH full and headline-only modes so the ratio is
comparable across rounds; each full run additionally records the
freshly re-derived estimate in BENCH_DETAILS.json as a diagnostic
(r3 re-derived 18.19 — the drift the frozen constant avoids).
All assumptions + secondary metrics (fp32 step, gen-forward img/s,
per-leg MFU) are written to BENCH_DETAILS.json and stderr.

Timing integrity (round-4 fix): round 3's driver capture recorded a
physically impossible 6.95 ms/step (MFU 904%) because the loop blocked
only on state.step, whose data-dependency chain is step+1 and does NOT
depend on the gradient work. Worse, direct probes show that on the
remote 'axon' platform block_until_ready can return without flushing
client-queued work at all (a 137-GFLOP matmul chain "timed" at
0.004 ms/iter until a device_get forced execution: 2.1 ms/iter), and a
device_get costs a ~33 ms tunnel roundtrip. Every leg therefore
(a) chains steps through the donated TrainState so the device cannot
reorder or elide them, (b) ends every timed region with a device_get of
one metrics scalar — the only true sync — and reports the DIFFERENCE of
a 2k-step and a k-step loop so the constant roundtrip overhead cancels
exactly, (c) cross-checks against per-step-synced steps and hard-fails
on >2.2x disagreement, and (d) hard-fails any leg whose MFU >= 100% of
MXU peak, all BEFORE the headline JSON is printed.

MFU denominators: every leg's MFU divides that leg's OWN cost-analysis
TFLOP/s by the v5e MXU peak (197e12). The same bf16 peak is the correct
bound for the fp32 leg too: at JAX's default matmul precision the TPU
executes f32 convolutions as bf16 MXU passes with f32 accumulation, so
there is no separate "fp32 peak" to divide by (the fp32 leg is labeled
accordingly).
"""

from __future__ import annotations

import json
import os
import sys
import time

A100_TF32_PEAK = 156e12  # dense TF32 TFLOP/s (A100 80GB datasheet)
A100_UTILIZATION = 0.30  # generous estimate for the torch reference
V5E_MXU_PEAK = 197e12  # TPU v5e chip peak bf16 TFLOP/s (MXU)
# FROZEN vs_baseline denominator (see module docstring): the r1-derived
# A100 estimate, used identically in full and headline-only modes.
A100_EST_IMG_S = 16.25


def log(msg):
    print(msg, file=sys.stderr, flush=True)


DIAG_LEGS = ("gen_fwd", "train_bf16_b8", "train_bf16_dexycb", "train_fp32")


def main():
    # A/B overrides (default = the measured production config):
    #   HOIG_BENCH_ENGINE=auto|gather|shift|pallas  corner engine for the
    #       bf16 legs (auto = measured best: shift); the fp32 diagnostic
    #       leg keeps its own measured best (gather)
    #   HOIG_BENCH_XLA_FLAGS="--xla_..."        appended before jax import
    #   HOIG_BENCH_HEADLINE_ONLY=1              skip gen-fwd + diagnostic
    #       legs (each is a cold compile measured in tens of minutes when
    #       the remote-compile service is congested; A/B sweeps only need
    #       the headline train step)
    #   HOIG_BENCH_BUDGET_S                     wall-clock budget for the
    #       diagnostic legs (default 2700); the headline is exempt
    #   HOIG_BENCH_LEG=<name>                   internal: run ONE leg and
    #       print its details (the orchestrator spawns these)
    leg = os.environ.get("HOIG_BENCH_LEG")
    headline_only = os.environ.get("HOIG_BENCH_HEADLINE_ONLY") == "1"
    if leg is None and not headline_only:
        # Full mode is a thin orchestrator: every leg runs in its OWN
        # subprocess, sequentially, with an enforced timeout on the
        # diagnostic legs. Round 4's driver capture timed out (rc=124)
        # with NO number recorded because a cold leg's compile (which the
        # in-process budget check cannot interrupt) outlived the driver's
        # timeout. A subprocess can be killed mid-compile; the headline
        # JSON line is printed the moment the headline leg returns.
        return orchestrate()
    return worker(leg or "train_bf16", headline_only)


def worker(leg: str, headline_only: bool):
    engine = os.environ.get("HOIG_BENCH_ENGINE", "auto")
    extra_flags = os.environ.get("HOIG_BENCH_XLA_FLAGS")
    if extra_flags:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + extra_flags
        ).strip()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the Pallas attention kernels are minutes
    # of Mosaic compile each; warm reruns skip every identical module
    from hoig_tpu.utils.cache import enable as _enable_cache

    _enable_cache(jax)

    from hoig_tpu.data.synthetic import synthetic_batch, synthetic_environment
    from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow
    from hoig_tpu.models.vgg import Vgg19Features
    from hoig_tpu.train import (
        TrainConfig,
        build_networks,
        init_state,
        make_train_step,
    )
    from hoig_tpu.train.trainer import composite, generator_kwargs

    S = 256
    B = 4  # reference per-GPU batch (scripts/train_hov3_ddp.sh:52)
    tables_np, mano, obj_verts = synthetic_environment(num_objects=2, image_size=S)
    tables = tables_np.as_jax()
    mano_params = mano.as_jax()
    ccfg = ConditioningConfig(image_size=S)
    # the benchmarked step is a single-device jit program: per-chip
    # throughput is measured on ONE chip regardless of host chip count
    # (multi-chip scaling goes through parallel.DataParallel, validated by
    # the dryrun_multichip contract, not benchmarked here)
    n_chips = 1

    batch = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(B, obj_verts, image_size=S).items()
    }
    details = {"batch": B, "image_size": S, "n_chips": n_chips,
               "device": str(jax.devices()[0])}

    def bench_step(tag, tcfg, n_iter=10, b=None, ccfg_=None, camera="matrix",
                   with_masks=True):
        B_ = b or B
        ccfg_ = ccfg_ or ccfg
        bt = batch if (B_ == B and camera == "matrix" and with_masks) else {
            k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
                else jnp.asarray(v))
            for k, v in synthetic_batch(
                B_, obj_verts, image_size=S, camera=camera,
                with_masks=with_masks,
            ).items()
        }
        g, d = build_networks(tcfg)
        vgg = Vgg19Features()
        rng = jax.random.PRNGKey(0)
        vgg_params = jax.jit(vgg.init)(rng, jnp.zeros((1, S, S, 3)))

        def gkw_of(b_):
            flow = hand_recovery_flow(
                tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
                b_["manoB"], ccfg_,
            )
            return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

        shapes = jax.eval_shape(gkw_of, bt)
        gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
               for k, v in shapes.items()}
        state = init_state(
            rng, g, d, tcfg, gkw, jnp.zeros((B_, S, S, tcfg.d_input_nc))
        )
        step_fn = make_train_step(
            g, d, vgg, vgg_params, tables, mano_params, ccfg_, tcfg
        )
        # constant data rides as a runtime argument: without this the VGG
        # weights + tables are baked into the module as ~60 MB of MLIR
        # constants, which the remote compile helper was OOM-killed on
        frozen = dict(vgg_params=vgg_params, tables=tables,
                      mano_params=mano_params)
        flops = None
        t0 = time.time()
        try:
            # AOT compile: one executable for cost analysis AND timing
            step = (
                jax.jit(step_fn, donate_argnums=(0,))
                .lower(state, bt, jnp.asarray(True), frozen)
                .compile()
            )
            ca = step.cost_analysis()
            if ca and ca.get("flops"):
                flops = float(ca["flops"])
        except Exception as e:  # cost analysis is best-effort on plugins
            log(f"{tag}: AOT cost analysis unavailable ({e})")
            step = jax.jit(step_fn, donate_argnums=(0,))
        def sync(metrics_):
            # device_get of one scalar: the only true sync on this
            # platform (block_until_ready can return without flushing)
            jax.device_get(jax.tree.leaves(metrics_)[0])

        state, metrics = step(state, bt, jnp.asarray(True), frozen)
        sync(metrics)
        details[f"{tag}_compile_s"] = round(time.time() - t0, 1)
        # cross-check reference: per-step-synced timing (min of 3) — an
        # upper bound on true step time (includes one ~33 ms roundtrip),
        # immune to async-dispatch artifacts
        blocked_ms = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, metrics = step(state, bt, jnp.asarray(True), frozen)
            sync(metrics)
            blocked_ms = min(blocked_ms, (time.time() - t0) * 1e3)

        # headline: difference of a 2k-loop and a k-loop (steps chain
        # through the donated state; ONE sync ends each loop, and the
        # constant sync/dispatch overhead cancels in the difference)
        def loop(k):
            nonlocal state
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                for _ in range(k):
                    state, m = step(state, bt, jnp.asarray(True), frozen)
                sync(m)
                best = min(best, time.time() - t0)
            return best

        t1 = loop(n_iter)
        t2 = loop(2 * n_iter)
        dt = max(t2 - t1, 1e-9)
        step_ms = dt / n_iter * 1e3
        details[f"{tag}_step_ms"] = round(step_ms, 2)
        details[f"{tag}_step_ms_blocked"] = round(blocked_ms, 2)
        # hard sanity: the pipelined loop may only be modestly faster than
        # fully-synchronous stepping (host dispatch overlap), never >2.2x
        if step_ms < blocked_ms / 2.2:
            raise RuntimeError(
                f"{tag}: TIMING ARTIFACT — pipelined loop measured "
                f"{step_ms:.2f} ms/step but per-step-synced is "
                f"{blocked_ms:.2f} ms; refusing to report"
            )
        ips = B_ * n_iter / dt / n_chips
        details[f"{tag}_images_per_sec_per_chip"] = round(ips, 3)
        if flops:
            tf = flops / (dt / n_iter) / 1e12
            mfu = tf * 1e12 / V5E_MXU_PEAK
            details[f"{tag}_tflops_per_sec"] = round(tf, 2)
            details[f"{tag}_mfu_vs_mxu_peak"] = round(mfu, 4)
            if mfu >= 1.0:
                raise RuntimeError(
                    f"{tag}: IMPOSSIBLE MFU {mfu:.1%} (> MXU peak) — "
                    f"timing artifact; refusing to report"
                )
        log(f"{tag}: {ips:.3f} img/s/chip ({dt/n_iter*1e3:.1f} ms/step)"
            + (f" MFU {details[f'{tag}_mfu_vs_mxu_peak']:.1%}" if flops else ""))
        return ips

    # production config: bf16 compute, selective remat (bottleneck +
    # attention activations stored), shift corner engine — what
    # environment.py auto-selects under --bf16
    from hoig_tpu.train.environment import resolve_corner_engine

    engine = resolve_corner_engine(engine, bf16=True)
    bf16_cfg = dict(
        compute_dtype=jnp.bfloat16, remat_bottleneck=False, remat_attn=False,
        corner_engine=engine,
    )
    details["corner_engine"] = engine
    if extra_flags:
        details["extra_xla_flags"] = extra_flags

    if headline_only:
        # A/B mode: time ONLY the headline train step. vs_baseline uses the
        # same frozen denominator as the full run.
        value = bench_step("train_bf16", TrainConfig(image_size=S, **bf16_cfg))
        # do not clobber the full run's BENCH_DETAILS.json from an A/B sweep
        with open("BENCH_AB.json", "a") as fp:
            json.dump(details, fp)
            fp.write("\n")
        print(json.dumps({
            "metric": "hogan_train_step_images_per_sec_per_chip_256_bf16",
            "value": round(value, 3), "unit": "images/sec/chip",
            "vs_baseline": round(value / A100_EST_IMG_S, 3),
        }), flush=True)
        log(json.dumps(details, indent=1))
        return

    # generator forward (BASELINE.md's second metric) + model FLOPs —
    # measured in the SAME bf16 production config as the headline so the
    # MFU numerator and denominator share one precision mode
    def gen_fwd_leg():
        tcfg = TrainConfig(image_size=S, **bf16_cfg)
        g, _ = build_networks(tcfg)
        rng = jax.random.PRNGKey(0)

        def fwd(params_g, b_, fz):
            flow = hand_recovery_flow(
                fz["tables"], fz["mano_params"], b_["imageA"], b_["imageB"],
                b_["manoA"], b_["manoB"], ccfg,
            )
            kw = generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)
            return composite(g.apply(params_g, **kw))

        frozen = dict(tables=tables, mano_params=mano_params)

        def gkw_shape(b_):
            flow = hand_recovery_flow(
                tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
                b_["manoB"], ccfg,
            )
            return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

        shapes = jax.eval_shape(gkw_shape, batch)
        gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
               for k, v in shapes.items()}
        params_g = jax.jit(lambda r, kw: g.init(r, **kw))(rng, gkw)
        flops_per_image = None
        try:
            # AOT-compile once; reuse the executable for timing (a separate
            # fwd_j() call would compile a second identical program)
            fwd_j = jax.jit(fwd).lower(params_g, batch, frozen).compile()
            ca = fwd_j.cost_analysis()
            if ca and ca.get("flops"):
                flops_per_image = float(ca["flops"]) / B
                details["gen_fwd_flops_per_image"] = flops_per_image
        except Exception as e:  # cost analysis is best-effort on plugins
            log(f"cost_analysis unavailable: {e}")
            fwd_j = jax.jit(fwd)

        # forward calls are chained (call i+1's imageA = call i's fake
        # output, transposed back to NCHW) so the device cannot elide or
        # overlap them; each timed loop ends with one device_get sync and
        # the k vs 2k loop difference cancels the constant overhead
        def fwd_loop(k, img0):
            best = float("inf")
            for _ in range(2):
                img = img0
                t0 = time.time()
                for _ in range(k):
                    out = fwd_j(params_g, dict(batch, imageA=img), frozen)
                    img = out[0].transpose(0, 3, 1, 2).astype(img0.dtype)
                jax.device_get(jnp.ravel(out[0])[:1])
                best = min(best, time.time() - t0)
            return best

        out = fwd_j(params_g, batch, frozen)
        jax.device_get(jnp.ravel(out[0])[:1])  # compile + flush
        n = 10
        dt = max(fwd_loop(2 * n, batch["imageA"]) - fwd_loop(n, batch["imageA"]),
                 1e-9)
        gen_ips = B * n / dt / n_chips
        details["gen_fwd_images_per_sec_per_chip"] = round(gen_ips, 3)
        details["gen_fwd_ms"] = round(dt / n * 1e3, 2)
        if flops_per_image:
            tf = flops_per_image * gen_ips / 1e12
            details["gen_fwd_tflops_per_sec"] = round(tf, 2)
            details["gen_fwd_mfu_vs_mxu_peak"] = round(
                tf * 1e12 / V5E_MXU_PEAK, 4
            )
            # fresh re-derivation of the A100 estimate: diagnostic only
            # (the vs_baseline denominator stays FROZEN)
            details.setdefault("baseline_estimate", {})[
                "a100_img_s_rederived_diagnostic"
            ] = round(
                A100_TF32_PEAK * A100_UTILIZATION / (3.0 * flops_per_image), 3
            )
        log(f"gen_fwd (bf16): {gen_ips:.3f} img/s/chip")

    # ---- single-leg dispatch (the orchestrator spawns one process per leg)
    if leg == "train_bf16":
        bench_step("train_bf16", TrainConfig(image_size=S, **bf16_cfg))
    elif leg == "gen_fwd":
        gen_fwd_leg()
    elif leg == "train_bf16_b8":
        # per-chip batch 8 — the recommended deployment config: 4 chips x
        # b8 = the reference's global batch 32 exactly, at ~0.7x the
        # per-image cost of b4 (PERF.md)
        bench_step("train_bf16_b8", TrainConfig(image_size=S, **bf16_cfg), b=8)
    elif leg == "train_bf16_dexycb":
        # DexYCB production variant (fxfy camera, PCA-45 MANO, 24-ch D,
        # hand-seg channels, no masks — SURVEY §2.11 delta table)
        ycb_ccfg = ConditioningConfig(
            image_size=S, camera_model="fxfy", mano_pca_comps=45,
            mano_flat_hand_mean=False,
        )
        bench_step(
            "train_bf16_dexycb",
            TrainConfig(
                image_size=S, bg_dim=13, img_cond_dim=9, d_input_nc=24,
                use_armask=False, **bf16_cfg,
            ),
            ccfg_=ycb_ccfg, camera="fxfy", with_masks=False,
        )
    elif leg == "train_fp32":
        # diagnostic: fp32 step (full remat — the only fp32 config that
        # fits HBM); MFU note: TPU runs f32 matmuls as bf16 MXU passes at
        # default precision, so the same MXU peak applies
        bench_step("train_fp32", TrainConfig(image_size=S))
    else:
        raise SystemExit(f"unknown HOIG_BENCH_LEG {leg!r}")
    print("LEGDETAILS " + json.dumps(details), flush=True)


def orchestrate():
    """Full-mode driver: one subprocess per leg, headline first.

    The orchestrator itself never imports jax, holds no TPU client and
    cannot get stuck in a compile: a diagnostic leg that exceeds the
    remaining HOIG_BENCH_BUDGET_S is killed and recorded as skipped, so
    the process always terminates shortly after the budget even when the
    remote-compile service hangs (the round-4 failure mode)."""
    import subprocess

    budget_s = float(os.environ.get("HOIG_BENCH_BUDGET_S", "2700"))
    t_start = time.time()
    details = {}

    def flush_details():
        with open("BENCH_DETAILS.json", "w") as fp:
            json.dump(details, fp, indent=1)

    def run_leg(name, timeout, extra_env=None):
        env = dict(os.environ)
        env["HOIG_BENCH_LEG"] = name
        if extra_env:
            env.update(extra_env)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            log(f"{name}: leg killed after {timeout:.0f}s (budget) — skipped")
            details.setdefault("legs_skipped_for_budget", []).append(name)
            return False
        for line in proc.stdout.splitlines():
            if line.startswith("LEGDETAILS "):
                leg_details = json.loads(line[len("LEGDETAILS "):])
                # nested merge: the gen_fwd leg contributes only the
                # rederived-diagnostic key and must not clobber the
                # FROZEN denominator entry
                be = leg_details.pop("baseline_estimate", None)
                if be:
                    details.setdefault("baseline_estimate", {}).update(be)
                details.update(leg_details)
                break
        else:
            log(f"{name}: leg exited rc={proc.returncode} with no details")
            details.setdefault("legs_failed", []).append(name)
            return False
        details[f"{name}_wall_s"] = round(time.time() - t0, 1)
        return proc.returncode == 0

    # HEADLINE FIRST. If the full-fidelity program cannot compile within
    # 45% of the budget (remote Mosaic compiles measured 60-100+ min
    # during the round-5 service outage), retry once under
    # HOIG_COMPILE_LITE=1 — the XLA-fallback program compiles in minutes
    # and its number is honest (just the measured-slower engine choice),
    # clearly labeled. The 45/55 split leaves the retry AND some
    # diagnostic legs room inside the overall budget.
    ok = run_leg("train_bf16", max(0.45 * budget_s, 600.0))
    if not ok and "train_bf16_images_per_sec_per_chip" not in details:
        log("headline: retrying with HOIG_COMPILE_LITE=1 (XLA fallback "
            "kernels) after budget timeout")
        details["headline_mode"] = "compile_lite_fallback"
        ok = run_leg(
            "train_bf16",
            max(budget_s - (time.time() - t_start), 600.0),
            {"HOIG_COMPILE_LITE": "1"},
        )
    value = details.get("train_bf16_images_per_sec_per_chip")
    if not ok or not value:
        flush_details()
        raise SystemExit("headline train_bf16 leg failed")
    details["baseline_estimate"] = {
        "a100_train_img_s_per_gpu_FROZEN": A100_EST_IMG_S,
        "derivation": "156e12 TF32 peak * 0.30 util / (3 * gen_fwd_flops"
                      "_per_image), frozen at the r1 derivation; reference "
                      "publishes no throughput",
    }
    flush_details()
    print(
        json.dumps(
            {
                "metric": "hogan_train_step_images_per_sec_per_chip_256_bf16",
                "value": round(value, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / A100_EST_IMG_S, 3),
            }
        ),
        flush=True,
    )

    for name in DIAG_LEGS:
        remaining = budget_s - (time.time() - t_start)
        if remaining < 60.0:
            log(f"{name}: SKIPPED — diagnostic budget exhausted "
                f"({remaining:.0f}s left of {budget_s:.0f}s)")
            details.setdefault("legs_skipped_for_budget", []).append(name)
            continue
        run_leg(name, remaining)
        flush_details()

    # cross-batch sanity: per-image cost must agree within 2.2x
    bf16_b8 = details.get("train_bf16_b8_images_per_sec_per_chip")
    if bf16_b8:
        ratio = value / bf16_b8
        if not (1 / 2.2 < ratio < 2.2):
            details["SANITY_FAIL_b4_vs_b8"] = (
                f"per-image throughput disagrees {ratio:.1f}x between "
                f"b4 ({value:.2f}) and b8 ({bf16_b8:.2f} img/s) — "
                "one of the legs is a timing artifact"
            )
            log("SANITY FAIL: " + details["SANITY_FAIL_b4_vs_b8"])
    fp32 = details.get("train_fp32_images_per_sec_per_chip")
    if fp32:
        details["bf16_speedup"] = round(value / fp32, 3)
    # compile-cost visibility (remote-compile fragility tracking): total
    # compile seconds this run + per-leg cache-hit heuristic (<60s = warm)
    compile_keys = [k for k in details if k.endswith("_compile_s")]
    details["compile_s_total"] = round(sum(details[k] for k in compile_keys), 1)
    details["compile_cache_warm_legs"] = sum(
        1 for k in compile_keys if details[k] < 60.0
    )
    flush_details()
    log(json.dumps(details, indent=1))


if __name__ == "__main__":
    main()
