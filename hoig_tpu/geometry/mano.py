"""MANO hand model: linear blend skinning in pure JAX.

Capability parity with the two MANO front-ends the reference uses:
  * smplx `create(..., 'mano', use_pca=False, flat_hand_mean=True)` driven by
    HandModelRecovery (HOIG_HOv3/models/networks/hmr.py:55,81),
  * manopth ManoLayer with 45 PCA components and mm->m scaling
    (HOIG_DexYCB/models/networks/hmr.py:55-61),
  * the self-contained batched LBS in
    HOIG_HOv3/models/networks/batch_mano.py:64-147.

The TPU design is one functional LBS (`mano_forward`) over a static
parameter pytree: everything is einsum/matmul (MXU-friendly), the 16-joint
kinematic chain is a statically unrolled accumulation, and the whole thing
jits/vmaps/shards with the rest of the conditioning front-end.

The MANO parameter pickle (MANO_RIGHT.pkl) is a registered-download asset in
the reference too; `MANOModel.synthetic()` builds a deterministic stand-in
with the real tensor shapes for tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
import pickle
import sys
import types

import jax
import jax.numpy as jnp

# Geometry math is tiny FLOPs but accuracy-critical: pin full-f32 matmuls
# (the platform default is reduced-precision, tuned for the conv stacks).
_HI = jax.lax.Precision.HIGHEST
import numpy as np

NUM_VERTS = 778
NUM_JOINTS = 16
NUM_SHAPE = 10
NUM_POSE = (NUM_JOINTS - 1) * 3  # 45

# Standard MANO kinematic parents (kintree_table row 0 remapped to columns).
MANO_PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], np.int32)

# Fingertip vertex ids and the joint slots they occupy in the 21-joint output
# (batch_mano.py:136-140 insertion order).
FINGERTIP_VERT_IDS = (745, 317, 444, 556, 673)


@dataclasses.dataclass
class MANOModel:
    """Host-side MANO parameters (numpy); `as_jax()` moves them on-device."""

    v_template: np.ndarray  # (778, 3)
    shapedirs: np.ndarray  # (778, 3, 10)
    posedirs: np.ndarray  # (778, 3, 135)
    j_regressor: np.ndarray  # (16, 778)
    lbs_weights: np.ndarray  # (778, 16)
    parents: np.ndarray  # (16,)
    hands_components: np.ndarray  # (45, 45)
    hands_mean: np.ndarray  # (45,)
    faces: np.ndarray  # (1538, 3)

    @classmethod
    def from_pickle(cls, path: str) -> "MANOModel":
        """Load MANO_RIGHT.pkl (handles chumpy-array pickles without chumpy)."""
        dd = _load_mano_pickle(path)
        kt = np.asarray(dd["kintree_table"])
        id_to_col = {int(kt[1, i]): i for i in range(kt.shape[1])}
        parents = np.array(
            [-1] + [id_to_col[int(kt[0, i])] for i in range(1, kt.shape[1])], np.int32
        )
        return cls(
            v_template=_to_np(dd["v_template"]).astype(np.float32),
            shapedirs=_to_np(dd["shapedirs"]).astype(np.float32),
            posedirs=_to_np(dd["posedirs"]).astype(np.float32),
            j_regressor=_to_np(dd["J_regressor"]).astype(np.float32),
            lbs_weights=_to_np(dd["weights"]).astype(np.float32),
            parents=parents,
            hands_components=_to_np(dd["hands_components"]).astype(np.float32),
            hands_mean=_to_np(dd["hands_mean"]).astype(np.float32),
            faces=_to_np(dd["f"]).astype(np.int32),
        )

    @classmethod
    def synthetic(cls, seed: int = 0) -> "MANOModel":
        """Deterministic stand-in with the real MANO tensor shapes."""
        rng = np.random.RandomState(seed)
        # a blobby "hand": vertices on a stretched ellipsoid
        u = rng.rand(NUM_VERTS) * 2 * np.pi
        v = rng.rand(NUM_VERTS) * np.pi
        v_template = np.stack(
            [0.1 * np.cos(u) * np.sin(v), 0.04 * np.sin(u) * np.sin(v), 0.03 * np.cos(v)],
            axis=-1,
        ).astype(np.float32)
        j_reg = np.abs(rng.randn(NUM_JOINTS, NUM_VERTS)).astype(np.float32)
        j_reg /= j_reg.sum(axis=1, keepdims=True)
        w = np.abs(rng.randn(NUM_VERTS, NUM_JOINTS)).astype(np.float32)
        w /= w.sum(axis=1, keepdims=True)
        comps = np.linalg.qr(rng.randn(NUM_POSE, NUM_POSE))[0].astype(np.float32)
        # random triangulation over vertex ids (1538 faces like the real model)
        faces = rng.randint(0, NUM_VERTS, (1538, 3)).astype(np.int32)
        return cls(
            v_template=v_template,
            shapedirs=(rng.randn(NUM_VERTS, 3, NUM_SHAPE) * 0.01).astype(np.float32),
            posedirs=(rng.randn(NUM_VERTS, 3, NUM_POSE * 3) * 0.001).astype(np.float32),
            j_regressor=j_reg,
            lbs_weights=w,
            parents=MANO_PARENTS.copy(),
            hands_components=comps,
            hands_mean=(rng.randn(NUM_POSE) * 0.1).astype(np.float32),
            faces=faces,
        )

    def as_jax(self) -> dict:
        return {
            "v_template": jnp.asarray(self.v_template),
            "shapedirs": jnp.asarray(self.shapedirs),
            "posedirs": jnp.asarray(self.posedirs),
            "j_regressor": jnp.asarray(self.j_regressor),
            "lbs_weights": jnp.asarray(self.lbs_weights),
            "hands_components": jnp.asarray(self.hands_components),
            "hands_mean": jnp.asarray(self.hands_mean),
        }


def _to_np(x) -> np.ndarray:
    if hasattr(x, "todense"):
        return np.asarray(x.todense())
    for attr in ("r", "x"):
        if hasattr(x, attr):
            return np.asarray(getattr(x, attr))
    return np.asarray(x)


class _ChStub:
    """Minimal stand-in for chumpy.Ch so MANO pickles load without chumpy."""

    def __setstate__(self, state):
        self.__dict__.update(state)


def _load_mano_pickle(path: str) -> dict:
    try:
        with open(path, "rb") as fp:
            return pickle.load(fp, encoding="latin1")
    except ModuleNotFoundError as e:
        if "chumpy" not in str(e):
            raise
    mod = types.ModuleType("chumpy")
    mod.Ch = _ChStub
    ch_mod = types.ModuleType("chumpy.ch")
    ch_mod.Ch = _ChStub
    reordering = types.ModuleType("chumpy.reordering")
    for name in ("Select", "transpose", "reshape"):
        setattr(reordering, name, _ChStub)
    saved = {k: sys.modules.get(k) for k in ("chumpy", "chumpy.ch", "chumpy.reordering")}
    sys.modules.update(
        {"chumpy": mod, "chumpy.ch": ch_mod, "chumpy.reordering": reordering}
    )
    try:
        with open(path, "rb") as fp:
            return pickle.load(fp, encoding="latin1")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Uses the numerically safe sinc formulation (the reference needs an
    explicit small-angle branch, batch_mano.py:46-52; here the Taylor
    blend is built in via jnp.where on a clamped angle).
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-8)
    n = rvec / safe
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    zeros = jnp.zeros_like(nx)
    k = jnp.stack(
        [
            jnp.stack([zeros, -nz, ny], -1),
            jnp.stack([nz, zeros, -nx], -1),
            jnp.stack([-ny, nx, zeros], -1),
        ],
        -2,
    )
    t = theta[..., None]
    eye = jnp.eye(3, dtype=rvec.dtype)
    # K^2 = n n^T - I for unit n, so R = cos(t) I + sin(t) K + (1-cos(t)) nn^T.
    # The outer product stays on the VPU at full f32 (a 3x3 `k @ k` matmul
    # would run at reduced default matmul precision).
    nnt = n[..., :, None] * n[..., None, :]
    r = jnp.cos(t) * eye + jnp.sin(t) * k + (1.0 - jnp.cos(t)) * nnt
    return jnp.where(t > 1e-8, r, eye + t * k)  # first-order fallback


def pca_to_axisang(
    pose_pca: jax.Array, params: dict, ncomps: int = 45, add_mean: bool = True
) -> jax.Array:
    """manopth-style PCA pose -> 45-dim axis-angle (DexYCB front-end,
    HOIG_DexYCB/models/networks/hmr.py:55-61)."""
    comps = params["hands_components"][:ncomps]
    full = jnp.matmul(pose_pca, comps, precision=_HI)
    if add_mean:
        full = full + params["hands_mean"]
    return full


def mano_forward(
    params: dict,
    global_orient: jax.Array,
    hand_pose: jax.Array,
    betas: jax.Array,
    transl: jax.Array | None = None,
    flat_hand_mean: bool = True,
) -> dict:
    """Batched MANO LBS.

    Args:
      params: MANOModel.as_jax() pytree.
      global_orient: (B, 3) root axis-angle.
      hand_pose: (B, 45) per-joint axis-angle (post-PCA if applicable).
      betas: (B, 10).
      transl: optional (B, 3) translation added to outputs (smplx `transl`).
      flat_hand_mean: if False, hands_mean is added to hand_pose (smplx
        semantics; the HOv3 path passes flat_hand_mean=True so the mean is
        already folded into the data).

    Returns:
      dict with 'vertices' (B, 778, 3) and 'joints' (B, 21, 3): 16 skeleton
      joints followed by 5 fingertip vertices (thumb..pinky).
    """
    if not flat_hand_mean:
        hand_pose = hand_pose + params["hands_mean"]
    b = global_orient.shape[0]
    full_pose = jnp.concatenate([global_orient, hand_pose], axis=1).reshape(b, NUM_JOINTS, 3)

    # Shape blendshapes.
    v_shaped = params["v_template"] + jnp.einsum(
        "bl,vcl->bvc", betas, params["shapedirs"], precision=_HI
    )
    joints = jnp.einsum("jv,bvc->bjc", params["j_regressor"], v_shaped, precision=_HI)

    # Pose blendshapes from non-root relative rotations.
    rot_mats = rodrigues(full_pose)  # (B, 16, 3, 3)
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(b, NUM_POSE * 3)
    v_posed = v_shaped + jnp.einsum("bp,vcp->bvc", pose_feature, params["posedirs"], precision=_HI)

    # Kinematic chain: statically unrolled relative-transform accumulation.
    parents = MANO_PARENTS
    rel_t = [joints[:, 0]]
    for i in range(1, NUM_JOINTS):
        rel_t.append(joints[:, i] - joints[:, parents[i]])
    transforms = []
    for i in range(NUM_JOINTS):
        t = jnp.concatenate([rot_mats[:, i], rel_t[i][:, :, None]], axis=2)  # (B,3,4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], rot_mats.dtype), (b, 1, 4)
        )
        local = jnp.concatenate([t, bottom], axis=1)  # (B,4,4)
        prev = transforms[parents[i]] if i else None
        transforms.append(local if i == 0 else jnp.matmul(prev, local, precision=_HI))
    a_global = jnp.stack(transforms, axis=1)  # (B, 16, 4, 4)

    posed_joints = a_global[:, :, :3, 3]
    # Remove the rest-pose joint location (the "inverse bind" part).
    j_h = jnp.concatenate([joints, jnp.zeros((b, NUM_JOINTS, 1), joints.dtype)], -1)
    correction = jnp.einsum("bjmn,bjn->bjm", a_global, j_h, precision=_HI)  # (B,16,4)
    a_skin = a_global.at[:, :, :, 3].add(-correction)

    # Skinning.
    t_verts = jnp.einsum("vj,bjmn->bvmn", params["lbs_weights"], a_skin, precision=_HI)
    v_h = jnp.concatenate([v_posed, jnp.ones((b, NUM_VERTS, 1), v_posed.dtype)], -1)
    verts = jnp.einsum("bvmn,bvn->bvm", t_verts, v_h, precision=_HI)[..., :3]

    # 21-joint output: skeleton + fingertips in MANO convention order.
    tips = verts[:, jnp.asarray(FINGERTIP_VERT_IDS), :]
    joints21 = jnp.concatenate([posed_joints, tips], axis=1)

    if transl is not None:
        verts = verts + transl[:, None, :]
        joints21 = joints21 + transl[:, None, :]
    return {"vertices": verts, "joints": joints21}
