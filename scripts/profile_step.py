"""Op-level TPU profile of the flagship train step (or gen forward).

Captures a jax.profiler xplane trace around a few steady-state steps of
the SAME program bench.py times, then aggregates device-plane op events
by HLO category so round-over-round PERF.md tables come from one
reproducible command:

    python scripts/profile_step.py --dtype bf16 [--engine shift|gather]
                                   [--leg train|fwd] [--batch 4]

The reference has no profiling subsystem at all (SURVEY.md §5); this is
new capability, TPU-native (xplane comes from the TPU runtime).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(dtype: str, engine: str, batch: int, leg: str):
    import jax
    import jax.numpy as jnp

    from hoig_tpu.data.synthetic import synthetic_batch, synthetic_environment
    from hoig_tpu.geometry.conditioning import (
        ConditioningConfig,
        hand_recovery_flow,
    )
    from hoig_tpu.models.vgg import Vgg19Features
    from hoig_tpu.train import (
        TrainConfig,
        build_networks,
        init_state,
        make_train_step,
    )
    from hoig_tpu.train.trainer import composite, generator_kwargs

    S = 256
    tables_np, mano, obj_verts = synthetic_environment(num_objects=2, image_size=S)
    tables = tables_np.as_jax()
    mano_params = mano.as_jax()
    ccfg = ConditioningConfig(image_size=S)
    kw = {"corner_engine": engine}
    if dtype == "bf16":
        kw.update(
            compute_dtype=jnp.bfloat16, remat_bottleneck=False, remat_attn=False
        )
    tcfg = TrainConfig(image_size=S, **kw)
    g, d = build_networks(tcfg)

    vgg = Vgg19Features()
    rng = jax.random.PRNGKey(0)
    vgg_params = jax.jit(vgg.init)(rng, jnp.zeros((1, S, S, 3)))
    bt = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(batch, obj_verts, image_size=S).items()
    }

    def gkw_of(b_):
        flow = hand_recovery_flow(
            tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
            b_["manoB"], ccfg,
        )
        return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

    if leg == "fwd":
        def fwd(params_g, b_):
            return composite(g.apply(params_g, **gkw_of(b_)))

        shapes = jax.eval_shape(gkw_of, bt)
        gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
               for k, v in shapes.items()}
        params_g = jax.jit(lambda r, k_: g.init(r, **k_))(rng, gkw)
        fwd_j = jax.jit(fwd)

        chain_img = [bt["imageA"]]

        def run_once(state, do_sync=True):
            # forward calls chain through imageA (composite fake_src fed
            # back, NCHW) so the device cannot elide or overlap them
            out = fwd_j(params_g, dict(bt, imageA=chain_img[0]))
            chain_img[0] = out[0].transpose(0, 3, 1, 2).astype(
                bt["imageA"].dtype
            )
            if do_sync:
                # device_get is the only true sync on the axon platform
                # (block_until_ready can return without flushing)
                jax.device_get(jnp.ravel(out[0])[:1])
            return state

        return run_once, None

    shapes = jax.eval_shape(gkw_of, bt)
    gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
           for k, v in shapes.items()}
    state = init_state(
        rng, g, d, tcfg, gkw, jnp.zeros((batch, S, S, tcfg.d_input_nc))
    )
    step_fn = make_train_step(g, d, vgg, vgg_params, tables, mano_params, ccfg, tcfg)
    step = jax.jit(step_fn, donate_argnums=(0,))
    frozen = dict(vgg_params=vgg_params, tables=tables, mano_params=mano_params)

    def run_once(st, do_sync=True):
        # device_get of one metrics scalar: the only true sync on the
        # axon platform — block_until_ready can return without flushing
        # queued work (the r3 904%-MFU bench artifact; see bench.py).
        # Steps chain through the donated state either way.
        st, metrics = step(st, bt, jnp.asarray(True), frozen)
        if do_sync:
            jax.device_get(metrics["loss_G"])
        return st

    return run_once, state


def aggregate_xplane(log_dir: str, n_steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as fp:
        space.ParseFromString(fp.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: m for m in plane.event_metadata.values()}
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        by_cat = collections.Counter()
        by_op = collections.Counter()
        total = 0
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                # TPU op line is usually "XLA Ops"; fall through and use
                # whichever line carries hlo_category stats
                pass
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else "?"
                cat = None
                for st in ev.stats:
                    if stat_meta.get(st.metadata_id) == "hlo_category":
                        cat = (st.str_value
                               or stat_meta.get(st.ref_value, str(st.ref_value)))
                if cat is None and line.name != "XLA Ops":
                    continue
                dur = ev.duration_ps / 1e6  # -> us
                by_cat[cat or "uncategorized"] += dur
                by_op[(cat or "?", name)] += dur
                total += dur
        if not by_op:
            continue
        print(f"\n== plane {plane.name}: {total/1e3/n_steps:.1f} ms/step "
              f"(over {n_steps} steps) ==")
        print("-- by HLO category (ms/step) --")
        for cat, us in by_cat.most_common(20):
            print(f"  {cat:32s} {us/1e3/n_steps:9.2f}")
        print("-- top 25 ops (ms/step) --")
        for (cat, name), us in by_op.most_common(25):
            print(f"  {us/1e3/n_steps:8.2f}  [{cat}] {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--engine", default="gather",
                    choices=["shift", "gather", "pallas"])
    ap.add_argument("--leg", default="train", choices=["train", "fwd"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--time_only", action="store_true",
                    help="skip the xplane trace: compile + 10-step timing "
                    "(fast A/B of engines / XLA flags)")
    ap.add_argument("--xla_flags", default=None,
                    help="appended to XLA_FLAGS before jax import, e.g. "
                    "'--xla_tpu_run_space_to_batch=false'")
    args = ap.parse_args()

    if args.xla_flags:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + args.xla_flags
        ).strip()

    import jax

    from hoig_tpu.utils.cache import enable as _enable_cache

    _enable_cache(jax)

    run_once, state = build_step(args.dtype, args.engine, args.batch, args.leg)
    t0 = time.time()
    state = run_once(state)  # compile
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr)
    state = run_once(state)  # steady-state warmup
    t0 = time.time()
    state = run_once(state)
    print(f"steady step {time.time()-t0:.3f}s", file=sys.stderr)

    if args.time_only:
        # k vs 2k loop difference: steps chain through the donated state,
        # one sync ends each loop, constant overhead cancels (bench.py)
        n = 8

        def loop(k):
            nonlocal_state = [state]
            best = float("inf")
            for _ in range(2):
                st = nonlocal_state[0]
                t0 = time.time()
                for _ in range(k - 1):
                    st = run_once(st, do_sync=False)
                st = run_once(st, do_sync=True)
                best = min(best, time.time() - t0)
                nonlocal_state[0] = st
            return best, nonlocal_state[0]

        t1, state = loop(n)
        t2, state = loop(2 * n)
        dt = max(t2 - t1, 1e-9) / n
        print(f"TIME {args.leg} {args.dtype} engine={args.engine} "
              f"b={args.batch}: {dt*1e3:.1f} ms/step "
              f"({args.batch/dt:.2f} img/s)")
        return

    log_dir = args.out or tempfile.mkdtemp(prefix="hoig_prof_")
    jax.profiler.start_trace(log_dir)
    for _ in range(args.steps):
        state = run_once(state)
    jax.profiler.stop_trace()
    print("trace:", log_dir, file=sys.stderr)
    aggregate_xplane(log_dir, args.steps)


if __name__ == "__main__":
    main()
