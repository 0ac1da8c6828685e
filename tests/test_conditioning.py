"""Conditioning front-end integration tests on the synthetic environment.

The reference's only check of this stage is a matplotlib smoke __main__
(utils/nmr.py:1225-1501); here the invariants are asserted: channel
layouts, mask algebra, flow validity, object-id batching, and the
atlas-resample roundtrip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoig_tpu.data.synthetic import (
    synthetic_batch,
    synthetic_environment,
    synthetic_theta,
)
from hoig_tpu.geometry import renderer as rend
from hoig_tpu.geometry.conditioning import (
    ConditioningConfig,
    get_details,
    hand_recovery_flow,
)

S = 64


@pytest.fixture(scope="module")
def env():
    tables_np, mano, obj_verts = synthetic_environment(2, S)
    return tables_np, tables_np.as_jax(), mano.as_jax(), obj_verts


def _theta(obj_verts, seed, b=2):
    return {
        k: jnp.asarray(v)
        for k, v in synthetic_theta(b, obj_verts, seed=seed, image_size=S).items()
    }


def test_render_fim_wim_hits_and_weights(env):
    tables_np, tables, mano, obj_verts = env
    info = get_details(mano, _theta(obj_verts, 1), ConditioningConfig(image_size=S))
    f2pts, fim, wim = rend.render_fim_wim(
        tables, info["cam"], info["verts"], info["obj_id"], S
    )
    fim, wim = np.asarray(fim), np.asarray(wim)
    assert (fim >= 0).sum() > 100  # scene visible
    hit = fim >= 0
    np.testing.assert_allclose(wim[hit].sum(-1), 1.0, rtol=1e-4)
    # face ids bounded by the per-sample object's face count
    nf = tables_np.num_faces[np.asarray(info["obj_id"])]
    assert (fim.max(axis=(1, 2)) < nf).all()
    assert f2pts.shape == (2, tables_np.faces.shape[1], 3, 2)


def test_encode_maps(env):
    tables_np, tables, mano, obj_verts = env
    cfg = ConditioningConfig(image_size=S)
    info = get_details(mano, _theta(obj_verts, 2), cfg)
    _, fim, _ = rend.render_fim_wim(tables, info["cam"], info["verts"], info["obj_id"], S)
    cond = np.asarray(rend.encode_fim(tables, info["obj_id"], fim))
    sem = np.asarray(rend.encode_sem(tables, info["obj_id"], fim))
    fim = np.asarray(fim)
    bg = fim < 0
    # bg pixels: cond = (0, 0, 1), sem = 0 (mesh.py create_mapping bg rows)
    bg_vals = cond.transpose(0, 2, 3, 1)[bg]
    assert np.abs(bg_vals - np.array([0, 0, 1.0])).max() < 1e-6
    assert (sem.transpose(0, 2, 3, 1)[bg] == 0).all()
    # hand faces (< 1538): sem in 1..6; object faces: sem = obj_id + 7
    hand_px = (fim >= 0) & (fim < rend.NUM_HAND_FACES)
    svals = sem[:, 0][hand_px]
    assert ((svals >= 1) & (svals <= 6)).all()
    for i in range(2):
        obj_px = fim[i] >= rend.NUM_HAND_FACES
        if obj_px.any():
            assert (sem[i, 0][obj_px] == int(info["obj_id"][i]) + 7).all()
    # object cond u is shifted by 1.5*(obj_index+1) (nmr.py:381)
    for i in range(2):
        obj_px = fim[i] >= rend.NUM_HAND_FACES
        if obj_px.any():
            assert cond[i, 0][obj_px].min() > 1.5


def test_cal_bc_transform_identity_pose(env):
    """src == dst pose -> flow is (approximately) the identity map."""
    tables_np, tables, mano, obj_verts = env
    cfg = ConditioningConfig(image_size=S)
    info = get_details(mano, _theta(obj_verts, 3), cfg)
    f2pts, fim, wim = rend.render_fim_wim(
        tables, info["cam"], info["verts"], info["obj_id"], S
    )
    t, o = rend.cal_bc_transform(f2pts, fim, fim, wim)
    t, o, fim = np.asarray(t), np.asarray(o), np.asarray(fim)
    hit = fim >= 0
    # warped coords at hit pixels should land near the pixel itself
    ys, xs = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    px = (xs / (S - 1)) * 2 - 1
    py = (ys / (S - 1)) * 2 - 1
    for i in range(2):
        m = hit[i]
        if m.sum() == 0:
            continue
        err = np.hypot(t[i, :, :, 0][m] - px[m], t[i, :, :, 1][m] - py[m])
        assert np.median(err) < 4.0 / S  # within ~2px
        # self-warp must be almost fully visible
        assert o[i][m].mean() < 0.1
    assert np.all(t[~hit] == -2.0)


def test_texture_roundtrip(env):
    """backward-warp to atlas then dense re-sample at the same pose
    reproduces the source image on visible, unoccluded pixels.

    Asserted on the *object* half: the synthetic hand chart packs 1538
    per-face cells into a 64px atlas (sub-pixel cells), so only the
    ~70-face object chart has enough texels for a clean roundtrip — the
    real MANO chart at 256px doesn't have that limitation.
    """
    tables_np, tables, mano, obj_verts = env
    cfg = ConditioningConfig(image_size=S)
    img = jnp.ones((2, 3, S, S)) * 0.3  # constant: roundtrip must be exact
    info = get_details(mano, _theta(obj_verts, 4), cfg)
    f2pts, fim, wim = rend.render_fim_wim(
        tables, info["cam"], info["verts"], info["obj_id"], S
    )
    tex = rend.get_texture_backward_warp(
        tables, img, f2pts, fim, info["obj_id"], pre_load=False
    )
    assert tex.shape == (2, 3, S, S // 2 * 5)
    t_grid = rend.sample_from_texture_dense(tables, fim, wim, info["obj_id"])
    from hoig_tpu.ops.grid_sample import grid_sample

    recon = np.asarray(grid_sample(tex, t_grid, align_corners=True))
    fim = np.asarray(fim)
    obj_hit = fim >= rend.NUM_HAND_FACES
    assert obj_hit.sum() > 500
    errs = np.abs(recon - 0.3).mean(1)[obj_hit]
    assert np.median(errs) < 1e-5
    # pre_load replaces the object half with the registered texture image
    tex2 = rend.get_texture_backward_warp(
        tables, img, f2pts, fim, info["obj_id"], pre_load=True
    )
    np.testing.assert_allclose(
        np.asarray(tex2[:, :, :, -S:]),
        np.asarray(jnp.take(tables["obj_tex"], info["obj_id"], axis=0)),
    )


def test_hand_recovery_flow_full(env):
    tables_np, tables, mano, obj_verts = env
    cfg = ConditioningConfig(image_size=S)
    batch = synthetic_batch(2, obj_verts, image_size=S)
    to_j = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    out = hand_recovery_flow(
        tables, mano, jnp.asarray(batch["imageA"]), jnp.asarray(batch["imageB"]),
        to_j(batch["manoA"]), to_j(batch["manoB"]), cfg,
    )
    assert out["input_G_src_bg"].shape == (2, 4, S, S)
    assert out["input_G_src_obj"].shape == (2, 15, S, S)
    assert out["input_G_src_hand"].shape == (2, 6, S, S)
    assert out["T"].shape == (2, S, S, 2)
    for k, v in out.items():
        if v is not None:
            assert np.isfinite(np.asarray(v)).all(), k
    # masks are {0,1}
    for k in ("src_crop_mask_bg", "src_crop_mask_hand"):
        vals = np.unique(np.asarray(out[k]))
        assert set(vals.tolist()) <= {0.0, 1.0}
    # T_hand is -2 outside the eroded hand region (trainer.py:81)
    t = np.asarray(out["T"])
    not_hand = np.asarray(out["tsf_crop_mask_hand"])[:, 0] == 1
    assert np.all(t[not_hand] == -2.0)


def test_dexycb_variant_channels(env):
    tables_np, tables, mano, obj_verts = env
    cfg = ConditioningConfig(image_size=S, camera_model="fxfy", mano_pca_comps=45)
    b = 2
    theta_a = synthetic_theta(b, obj_verts, seed=5, camera="fxfy", image_size=S)
    theta_b = synthetic_theta(b, obj_verts, seed=6, camera="fxfy", image_size=S)
    for t in (theta_a, theta_b):
        t["pose"] = np.concatenate([t["pose"], t.pop("handtrans")], axis=1)
    to_j = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    rng = np.random.RandomState(0)
    img = jnp.asarray((rng.rand(b, 3, S, S) * 2 - 1).astype(np.float32))
    out = hand_recovery_flow(tables, mano, img, img, to_j(theta_a), to_j(theta_b), cfg)
    # DexYCB appends seg[:, :6] to the hand branches -> 3+3+6 channels
    assert out["input_G_src_hand"].shape == (b, 12, S, S)
    assert out["input_G_tsf_hand"].shape == (b, 12, S, S)
