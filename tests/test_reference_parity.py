"""Value-level parity against the reference's pure-torch geometry.

The reference implementation (/root/reference/HOIG_HOv3) keeps its whole
conditioning math in plain torch, CPU-runnable: cal_bc_transform
(utils/nmr.py:874-968), get_texture_backward_warp (:973-1058),
sample_from_texture_dense (:1068-1100), encode_fim/encode_sem (:567-595),
util.morph (utils/util.py:142-158) and the batched MANO LBS
(models/networks/batch_mano.py:64-147). These tests execute that code as
an *oracle* on synthetic meshes/fims/wims produced by the JAX side and
assert value-level agreement — turning the claimed quirk-preservations
into evidence instead of narration.

The oracle modules are loaded from /root/reference at test time (never
copied); everything is skipped when the reference tree or torch is absent.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/HOIG_HOv3")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree absent")


# --------------------------------------------------------------------- oracle
def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def oracle():
    """Import the reference's nmr / util / batch_mano with CUDA-free stubs."""
    # the reference sprinkles .cuda() on freshly made tensors; run them on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self

    _stub_module("neural_renderer")
    lbs = _stub_module("smplx.lbs", transform_mat=None)
    smplx = _stub_module("smplx")
    smplx.lbs = lbs
    tv = _stub_module("torchvision")
    tv.utils = _stub_module("torchvision.utils")
    tv.transforms = _stub_module("torchvision.transforms")
    tv.transforms.functional = _stub_module("torchvision.transforms.functional")

    sys.path.insert(0, str(REF))
    try:
        from models.networks import batch_mano as ref_batch_mano
        from utils import nmr as ref_nmr
        from utils import util as ref_util
    finally:
        sys.path.remove(str(REF))

    yield types.SimpleNamespace(
        nmr=ref_nmr, util=ref_util, batch_mano=ref_batch_mano
    )
    torch.Tensor.cuda = orig_cuda


def _bare_renderer(oracle, tables_np, obj_index, obj_name="syn"):
    """A MANORenderer with only the buffers the oracle methods touch,
    filled from OUR surface tables (so both sides see identical inputs)."""
    import torch.nn as nn

    r = oracle.nmr.MANORenderer.__new__(oracle.nmr.MANORenderer)
    nn.Module.__init__(r)
    r.image_size = 256
    j = obj_index
    nf = int(tables_np.num_faces[j])
    t = torch.from_numpy
    # reference tables are exact-length (nf [+1 bg]); ours are padded
    setattr(r, f"fim_uv_{obj_name}", t(tables_np.fim_uv[j][None].astype(np.float32)))
    setattr(r, f"wim_uv_{obj_name}", t(tables_np.wim_uv[j][None]))
    setattr(r, f"faces_uv_coord_{obj_name}", t(tables_np.faces_uv_coord[j][:nf][None]))
    setattr(r, f"obj_tex_img_{obj_name}", t(tables_np.obj_tex[j].transpose(1, 2, 0)))
    setattr(r, f"map_fn_{obj_name}", t(np.concatenate(
        [tables_np.map_fn[j][:nf], tables_np.map_fn[j][-1:]], axis=0)))
    setattr(r, f"sem_full_{obj_name}", t(np.concatenate(
        [tables_np.sem[j][:nf], tables_np.sem[j][-1:]], axis=0)))
    return r


# --------------------------------------------------------------------- inputs
@pytest.fixture(scope="module")
def scene():
    """Synthetic 256px scene rendered by the JAX side: per-sample f2pts,
    fim, wim for source and destination poses (identical inputs for both
    implementations; only the conditioning math under test differs)."""
    from hoig_tpu.data.synthetic import synthetic_environment, synthetic_theta
    from hoig_tpu.geometry.conditioning import ConditioningConfig, get_details
    from hoig_tpu.geometry.renderer import render_fim_wim

    tables_np, mano, obj_verts = synthetic_environment(num_objects=2, image_size=256)
    tables = tables_np.as_jax()
    ccfg = ConditioningConfig(image_size=256)
    b = 2

    out = {}
    for key, seed in (("src", 3), ("dst", 4)):
        theta = {k: jnp.asarray(v) for k, v in
                 synthetic_theta(b, obj_verts, seed=seed).items()}
        # pin both samples to object 0 (the oracle is per-object-name)
        theta["obj_id"] = jnp.zeros((b,), jnp.int32)
        det = get_details(mano.as_jax(), theta, ccfg)
        f2pts, fim, wim = jax.jit(render_fim_wim, static_argnums=(4,))(
            tables, det["cam"], det["verts"], det["obj_id"], 256
        )
        # trainer flips y before the warp ops (models/trainer.py:67-68)
        f2pts = f2pts.at[..., 1].multiply(-1.0)
        out[key] = dict(
            f2pts=np.asarray(f2pts), fim=np.asarray(fim), wim=np.asarray(wim)
        )
    rng = np.random.RandomState(0)
    out["img"] = (rng.rand(b, 3, 256, 256).astype(np.float32) * 2.0) - 1.0
    out["tables_np"] = tables_np
    out["tables"] = tables
    assert (out["src"]["fim"] >= 0).any(), "empty source render"
    assert (out["dst"]["fim"] >= 0).any(), "empty destination render"
    return out


# ---------------------------------------------------------------------- tests
def test_cal_bc_transform_matches_reference(oracle, scene):
    """nmr.py:874-968 vs geometry/renderer.cal_bc_transform."""
    from hoig_tpu.geometry.renderer import cal_bc_transform

    r = _bare_renderer(oracle, scene["tables_np"], 0)
    t = torch.from_numpy
    with torch.no_grad():
        T_ref, O_ref = oracle.nmr.MANORenderer.cal_bc_transform(
            r,
            t(scene["src"]["f2pts"]),
            t(scene["src"]["fim"].astype(np.float32)),
            t(scene["dst"]["fim"].astype(np.float32)),
            t(scene["dst"]["wim"]),
        )

    T_jax, O_jax = jax.jit(cal_bc_transform)(
        jnp.asarray(scene["src"]["f2pts"]),
        jnp.asarray(scene["src"]["fim"]),
        jnp.asarray(scene["dst"]["fim"]),
        jnp.asarray(scene["dst"]["wim"]),
    )
    np.testing.assert_allclose(
        np.asarray(T_jax), T_ref.numpy(), atol=1e-4, rtol=0
    )
    # occlusion is a hard 0/1 decision; require exact agreement
    np.testing.assert_array_equal(np.asarray(O_jax), O_ref.numpy())


def test_texture_backward_warp_matches_reference(oracle, scene):
    """nmr.py:973-1058 vs geometry/renderer.get_texture_backward_warp
    (also exercises grid_sample + morph parity end-to-end)."""
    from hoig_tpu.geometry.renderer import get_texture_backward_warp

    r = _bare_renderer(oracle, scene["tables_np"], 0)
    t = torch.from_numpy
    with torch.no_grad():
        tex_ref = oracle.nmr.MANORenderer.get_texture_backward_warp(
            r,
            t(scene["img"]),
            t(scene["src"]["f2pts"]),
            t(scene["src"]["fim"].astype(np.float32)),
            "syn",
            pre_load=True,
        )

    obj_ids = jnp.zeros((2,), jnp.int32)
    tex_jax = jax.jit(get_texture_backward_warp, static_argnums=(5,))(
        scene["tables"],
        jnp.asarray(scene["img"]),
        jnp.asarray(scene["src"]["f2pts"]),
        jnp.asarray(scene["src"]["fim"]),
        obj_ids,
        True,
    )
    np.testing.assert_allclose(
        np.asarray(tex_jax), tex_ref.numpy(), atol=1e-4, rtol=0
    )


def test_sample_from_texture_dense_matches_reference(oracle, scene):
    """nmr.py:1068-1100 vs geometry/renderer.sample_from_texture_dense."""
    from hoig_tpu.geometry.renderer import sample_from_texture_dense

    r = _bare_renderer(oracle, scene["tables_np"], 0)
    t = torch.from_numpy
    with torch.no_grad():
        T_ref = oracle.nmr.MANORenderer.sample_from_texture_dense(
            r,
            t(scene["dst"]["fim"].astype(np.float32)),
            t(scene["dst"]["wim"]),
            "syn",
        )
    T_jax = jax.jit(sample_from_texture_dense)(
        scene["tables"],
        jnp.asarray(scene["dst"]["fim"]),
        jnp.asarray(scene["dst"]["wim"]),
        jnp.zeros((2,), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(T_jax), T_ref.numpy(), atol=1e-4, rtol=0
    )


def test_encode_fim_sem_match_reference(oracle, scene):
    """nmr.py:567-595 vs geometry/renderer.encode_fim / encode_sem."""
    from hoig_tpu.geometry.renderer import encode_fim, encode_sem

    r = _bare_renderer(oracle, scene["tables_np"], 0)
    t = torch.from_numpy
    fim_t = t(scene["dst"]["fim"].astype(np.float32))
    with torch.no_grad():
        fim_enc_ref, _ = oracle.nmr.MANORenderer.encode_fim(
            r, None, None, "syn", fim=fim_t, transpose=True
        )
        sem_enc_ref, _ = oracle.nmr.MANORenderer.encode_sem(
            r, None, None, "syn", fim=fim_t, transpose=True
        )

    obj_ids = jnp.zeros((2,), jnp.int32)
    fim = jnp.asarray(scene["dst"]["fim"])
    fim_enc = jax.jit(encode_fim)(scene["tables"], obj_ids, fim)
    sem_enc = jax.jit(encode_sem)(scene["tables"], obj_ids, fim)
    np.testing.assert_allclose(
        np.asarray(fim_enc), fim_enc_ref.numpy(), atol=1e-6, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(sem_enc), sem_enc_ref.numpy(), atol=1e-6, rtol=0
    )


@pytest.mark.parametrize("ks", [3, 15])
@pytest.mark.parametrize("mode", ["erode", "dilate"])
def test_morph_matches_reference(oracle, ks, mode):
    """utils/util.py:142-158 vs ops/morph.morph."""
    from hoig_tpu.ops.morph import morph

    rng = np.random.RandomState(ks)
    mask = (rng.rand(2, 1, 64, 64) > 0.6).astype(np.float32)
    with torch.no_grad():
        out_ref = oracle.util.morph(torch.from_numpy(mask), ks=ks, mode=mode)
    out_jax = jax.jit(morph, static_argnums=(1, 2))(jnp.asarray(mask), ks, mode)
    np.testing.assert_array_equal(np.asarray(out_jax), out_ref.numpy())


def test_mano_lbs_matches_reference(oracle):
    """batch_mano.py:64-147 vs geometry/mano.mano_forward.

    The oracle MANO is built from OUR synthetic parameter set (same
    v_template/shapedirs/posedirs/J_regressor/weights/PCA basis), its
    root_rot=[pi,0,0] convention reproduced by passing that as
    global_orient and applying the outer rotation afterwards. Vertices and
    the 16 skeleton joints must agree; fingertip joints intentionally
    differ (we follow the smplx tip ids 745/317/444/556/673 used by the
    HOv3 production path, hmr.py:55 — batch_mano's 333/444/672/555/745 is
    its dead-path variant)."""
    import torch.nn as nn

    from hoig_tpu.geometry.mano import MANOModel, pca_to_axisang, mano_forward, rodrigues

    model = MANOModel.synthetic(seed=0)
    params = model.as_jax()

    m = oracle.batch_mano.MANO.__new__(oracle.batch_mano.MANO)
    nn.Module.__init__(m)
    m.bases_num = 10
    m.pose_num = 45
    m.mesh_num = 778
    m.keypoints_num = 16
    m.parent = {i: int(model.parents[i]) for i in range(1, 16)}
    m.kintree_table = np.stack(
        [np.concatenate([[0], model.parents[1:]]), np.arange(16)]
    )
    t = torch.from_numpy
    m.mesh_mu = t(model.v_template[None])
    m.mesh_pca = t(model.shapedirs[None])
    m.posedirs = t(model.posedirs.reshape(778, 3, 135)[None])
    m.J_regressor = t(model.j_regressor[None])
    m.weights = t(model.lbs_weights[None])
    m.hands_components = t(model.hands_components[None])
    m.hands_mean = t(model.hands_mean[None])
    m.root_rot = torch.tensor([np.pi, 0.0, 0.0]).float().unsqueeze(0)

    rng = np.random.RandomState(5)
    b = 3
    rots = (rng.randn(b, 3) * 0.5).astype(np.float32)
    poses = (rng.randn(b, 45) * 0.5).astype(np.float32)
    betas = (rng.randn(b, 10) * 0.5).astype(np.float32)

    with torch.no_grad():
        x3d = m.rot_pose_beta_to_mesh(t(rots), t(poses), t(betas)).numpy()
    jtr_ref, v_ref = x3d[:, :21], x3d[:, 21:]

    hand_pose = pca_to_axisang(jnp.asarray(poses), params, ncomps=45, add_mean=True)
    root = jnp.tile(jnp.asarray([[np.pi, 0.0, 0.0]], jnp.float32), (b, 1))
    out = mano_forward(params, root, hand_pose, jnp.asarray(betas),
                       flat_hand_mean=True)
    R = rodrigues(jnp.asarray(rots))  # outer global rotation (batch_mano.py:128)
    v_jax = jnp.einsum("bij,bvj->bvi", R, out["vertices"])
    j_jax = jnp.einsum("bij,bvj->bvi", R, out["joints"])

    np.testing.assert_allclose(np.asarray(v_jax), v_ref, atol=2e-5, rtol=0)
    # reference tips are inserted at 4/8/12/16/20; skeleton joints are the rest
    skel_slots = [i for i in range(21) if i not in (4, 8, 12, 16, 20)]
    np.testing.assert_allclose(
        np.asarray(j_jax[:, :16]), jtr_ref[:, skel_slots], atol=2e-5, rtol=0
    )
