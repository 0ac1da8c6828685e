"""Per-layer flow-attention engine A/B (VERDICT r3 item 3).

The flagship generator runs ExtractorAttn at 9 lockstep layers — shapes
(B,128,128,128), (B,64,64,256) and 7x (B,32,32,512) at conv_dim 64 /
n_down 3 / repeat 6 — through one of three corner engines (shift /
gather / pallas, models/generator.py). This script measures, per distinct
layer shape and engine, the steady-state forward-only time and the
fwd+bwd time (gradients w.r.t. source, target, flow AND the fc params,
exactly the training data-dependency set), so the `--corner_engine auto`
default is backed by per-layer data instead of a whole-step guess.

Timing integrity: iterations are CHAINED through a lax.fori_loop data
dependency (iteration i+1 consumes iteration i's output), so the device
must serialize them — a pipelined host loop over independent calls
mis-reported 0.018 ms for a >=0.5 ms-of-MXU-work shape on the async
axon platform (the same artifact class as the r3 bench corruption).
Additionally, on this platform block_until_ready can return without
flushing client-queued work (measured: a 137-GFLOP matmul chain "timed"
at 0.004 ms/iter; forcing a device_get revealed 2.1 ms/iter), and a
device_get costs a ~33 ms tunnel roundtrip. So each measurement times
ONE chain call and TWO queued chain calls, each ended by a tiny
device_get sync, and reports (t2 - t1) / n — the constant roundtrip
overhead cancels exactly.

    python scripts/attn_ab.py [--batch 4] [--dtype bf16]
                              [--engines shift,gather,pallas]

Emits a markdown table (for PERF.md) + a JSON line per (shape, engine).
The replaced reference op is thirdparty/block_extractor/
block_extractor_kernel.cu:20-170 (fwd 20-85, atomicAdd bwd 89-170).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--engines", default="shift,gather,pallas")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hoig_tpu.utils.cache import enable as _enable_cache

    _enable_cache(jax)

    from hoig_tpu.models.generator import ExtractorAttn
    from hoig_tpu.models.layers import set_compute_dtype

    b = args.batch
    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    set_compute_dtype(cd)  # read at trace time by ExtractorAttn
    # (layer-id-list, h, c) of the flagship's 9 attention layers
    shapes = [((1,), 128, 128), ((2,), 64, 256), (tuple(range(3, 10)), 32, 512)]
    engines = args.engines.split(",")

    rows = []
    for layers, h, c in shapes:
        rng = jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 4)
        source = jax.random.normal(ks[0], (b, h, h, c), jnp.float32)
        target = jax.random.normal(ks[1], (b, h, h, c), jnp.float32)
        # HOGAN-bounded flow: T in [-2,1] minus idt in [-1,1) -> [-3, 2)
        flow = jax.random.uniform(
            ks[2], (b, h, h, 2), jnp.float32, minval=-3.0, maxval=1.99
        )
        for engine in engines:
            mod = ExtractorAttn(kernel_size=5, corner_engine=engine)

            def apply(params, s_, t_, f_):
                return mod.apply(params, s_, t_, f_)

            try:
                params = mod.init(ks[3], source, target, flow)
                n = args.iters

                # chained loops: iteration i+1 reads iteration i's result,
                # so the device cannot overlap or drop iterations
                @jax.jit
                def fwd_chain(params, s_, t_, f_):
                    def body(_, s):
                        return apply(params, s, t_, f_).astype(s.dtype)

                    return jax.lax.fori_loop(0, n, body, s_)

                def loss(params, s_, t_, f_):
                    return jnp.sum(apply(params, s_, t_, f_).astype(jnp.float32))

                grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3))

                @jax.jit
                def bwd_chain(params, s_, t_, f_):
                    def body(_, s):
                        gp, gs, gt, gf = grad_fn(params, s, t_, f_)
                        # fold every gradient into the carried value so none
                        # is dead code; normalize to keep the chain finite
                        scal = jnp.mean(gf.astype(jnp.float32)) + sum(
                            jnp.sum(g.astype(jnp.float32))
                            for g in jax.tree.leaves(gp)
                        )
                        nxt = (gs + gt).astype(jnp.float32) + scal
                        norm = jnp.maximum(
                            jnp.sqrt(jnp.mean(jnp.square(nxt))), 1e-6
                        )
                        return (nxt / norm).astype(s.dtype)

                    return jax.lax.fori_loop(0, n, body, s_)

                def sync(x):
                    # device_get is the only true sync on this platform
                    jax.device_get(jnp.ravel(x)[:1])

                def timeit(fn):
                    # both chain calls consume the previous output as the
                    # source arg, so a lazy runtime cannot elide either
                    sync(fn(params, source, target, flow))  # compile+warm

                    def once(k):
                        best = float("inf")
                        for _ in range(3):
                            t0 = time.time()
                            out = source
                            for _ in range(k):
                                out = fn(params, out, target, flow)
                            sync(out)
                            best = min(best, time.time() - t0)
                        return best

                    t1, t2 = once(1), once(2)
                    return max(t2 - t1, 0.0) / n * 1e3

                fwd_ms = timeit(fwd_chain)
                bwd_ms = timeit(bwd_chain)
            except Exception as e:
                print(f"({h},{c}) {engine}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr)
                fwd_ms = bwd_ms = None
            row = {
                "shape": f"({b},{h},{h},{c})", "layers": list(layers),
                "engine": engine, "dtype": args.dtype,
                "fwd_ms": None if fwd_ms is None else round(fwd_ms, 3),
                "fwd_bwd_ms": None if bwd_ms is None else round(bwd_ms, 3),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n| shape | layers | engine | fwd ms | fwd+bwd ms | x9-step cost ms |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        n = len(r["layers"])
        tot = None if r["fwd_bwd_ms"] is None else round(r["fwd_bwd_ms"] * n, 2)
        print(f"| {r['shape']} | {r['layers'][0]}..{r['layers'][-1]} "
              f"| {r['engine']} | {r['fwd_ms']} | {r['fwd_bwd_ms']} | {tot} |")


if __name__ == "__main__":
    main()
