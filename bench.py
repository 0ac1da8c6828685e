"""Throughput benchmark: 256x256 images/sec/chip, gen fwd + full GAN step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
reported against a nominal 8xV100 DDP reference estimate derived from the
reference's training config; treat it as provisional until the A100
baseline is measured.

Runs the flagship config: generator_spade_attn (conv_dim 64, repeat 6,
SPADE + 9 flow-guided attention layers), PatchGAN-4, full loss set, with
the conditioning stage fused into the step (the production path).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hoig_tpu.data.synthetic import synthetic_batch, synthetic_environment
    from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow
    from hoig_tpu.models.vgg import Vgg19Features
    from hoig_tpu.train import (
        TrainConfig,
        build_networks,
        init_state,
        make_train_step,
    )
    from hoig_tpu.train.trainer import generator_kwargs

    S = 256
    B = 4  # reference per-GPU batch (scripts/train_hov3_ddp.sh:52)
    tables_np, mano, obj_verts = synthetic_environment(num_objects=2, image_size=S)
    tables = tables_np.as_jax()
    mano_params = mano.as_jax()
    ccfg = ConditioningConfig(image_size=S)
    tcfg = TrainConfig(image_size=S)

    g, d = build_networks(tcfg)
    vgg = Vgg19Features()
    rng = jax.random.PRNGKey(0)
    vgg_params = jax.jit(vgg.init)(rng, jnp.zeros((1, S, S, 3)))

    batch = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(B, obj_verts, image_size=S).items()
    }

    def gkw_of(b_):
        flow = hand_recovery_flow(
            tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
            b_["manoB"], ccfg,
        )
        return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

    shapes = jax.eval_shape(gkw_of, batch)
    gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
           for k, v in shapes.items()}
    state = init_state(rng, g, d, tcfg, gkw, jnp.zeros((B, S, S, tcfg.d_input_nc)))

    step = jax.jit(
        make_train_step(g, d, vgg, vgg_params, tables, mano_params, ccfg, tcfg),
        donate_argnums=(0,),
    )

    # warmup/compile
    t0 = time.time()
    state, _ = step(state, batch, jnp.asarray(True))
    jax.block_until_ready(state.step)
    compile_s = time.time() - t0

    # timed steps
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        state, metrics = step(state, batch, jnp.asarray(True))
    jax.block_until_ready(state.step)
    dt = time.time() - t0

    imgs_per_sec = B * n_iter / dt
    n_chips = max(1, len(jax.devices()))
    value = imgs_per_sec / n_chips
    # provisional reference point: the 8-GPU reference config processes
    # ~8*4 imgs per ~2s-class step on V100s => ~2 img/s/GPU (unmeasured).
    nominal_ref = 2.0
    print(
        json.dumps(
            {
                "metric": "hogan_train_step_images_per_sec_per_chip_256",
                "value": round(value, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / nominal_ref, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
