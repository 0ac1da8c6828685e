"""Real-format dataset fixture tests.

Fabricates an HO3Dv3-format tree (meta pkls, bbx/train/test pickles,
rgb+mask PNGs — reference HOIG_HOv3/data/hov3_dataset.py:198-261) and a
DexYCB-format tree (labels_{frame:06d}.npz, valid_video_info.pkl —
HOIG_DexYCB/data/ycb_dataset.py:133-295), then exercises
HOv3Dataset / YCBDataset end-to-end: __getitem__, loader collation, and
the schema contract into the conditioning stage (eval_shape = zero-compile
schema check; one real jitted train step for HOv3).
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")


# ----------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def env64():
    """Synthetic environment whose two objects double as the YCB assets."""
    from hoig_tpu.data.synthetic import synthetic_environment

    tables_np, mano, obj_verts = synthetic_environment(num_objects=2, image_size=64)
    return dict(tables_np=tables_np, mano=mano, obj_verts=obj_verts)


def _write_synth_obj_assets(root, names, template):
    """Copy the environment's synthetic OBJs under dataset-asset names so
    dataset obj ids line up with surface-table rows."""
    for i, name in enumerate(names):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        src = template(i)
        with open(src) as fin, open(
            os.path.join(d, os.path.basename(src).replace(
                os.path.basename(src), name + ".obj")), "w"
        ) as fout:
            fout.write(fin.read())


@pytest.fixture(scope="module")
def hov3_tree(tmp_path_factory, env64):
    """2 videos x 4 frames in the exact HO3Dv3 on-disk layout."""
    from hoig_tpu.data.synthetic import write_synthetic_obj

    root = tmp_path_factory.mktemp("hov3")
    data_dir = str(root / "data")
    obj_dir = str(root / "assets_obj")
    rng = np.random.RandomState(0)

    names = ["003_cracker_box", "004_sugar_box"]  # OBJNAMES indices 0, 1
    for i, name in enumerate(names):
        d = os.path.join(obj_dir, name)
        os.makedirs(d)
        # same seeds as synthetic_environment -> verts match the tables
        write_synthetic_obj(os.path.join(d, name + ".obj"), seed=i)

    vids = {"ABF10_0": names[0], "GPMF11_0": names[1]}
    frames = ["%04d.jpg" % i for i in range(4)]
    bbx, vids_dict = {}, {}
    for vid, obj_name in vids.items():
        seq = vid.split("_")[0]
        for sub in ("rgb", "mask", "meta"):
            os.makedirs(os.path.join(data_dir, "images", "train", seq, sub),
                        exist_ok=True)
        bbx[vid] = [80.0, 60.0, 320.0, 320.0]  # x, y, w, h
        vids_dict[vid] = frames
        for f in frames:
            fid = f.split(".")[0]
            img = rng.randint(0, 255, (480, 640, 3), np.uint8)
            cv2.imwrite(os.path.join(data_dir, "images", "train", seq, "rgb", f), img)
            mask = (rng.rand(480, 640) > 0.5).astype(np.uint8) * 255
            cv2.imwrite(
                os.path.join(data_dir, "images", "train", seq, "mask",
                             "%05d.png" % int(fid)),
                np.stack([mask] * 3, axis=-1),
            )
            anno = {
                "objName": obj_name,
                "objRot": rng.randn(3, 1).astype(np.float32) * 0.3,
                "objTrans": (rng.randn(3) * 0.02 + [0, 0, 0.55]).astype(np.float32),
                "camMat": np.array(
                    [[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]], np.float32
                ),
                "handPose": (rng.randn(48) * 0.1).astype(np.float32),
                "handBeta": (rng.randn(10) * 0.3).astype(np.float32),
                "handTrans": np.array([0, 0, 0.5], np.float32),
            }
            with open(os.path.join(data_dir, "images", "train", seq, "meta",
                                   fid + ".pkl"), "wb") as fp:
                pickle.dump(anno, fp)

    os.makedirs(os.path.join(data_dir, "params"))
    for fname, payload in [
        ("HOv3-CR_bbx.pkl", bbx),
        ("HOv3-CR_train_new.pkl", vids_dict),
        ("HOv3-CR_test_new.pkl", vids_dict),
    ]:
        with open(os.path.join(data_dir, "params", fname), "wb") as fp:
            pickle.dump(payload, fp)
    return dict(data_dir=data_dir, obj_dir=obj_dir)


@pytest.fixture(scope="module")
def ycb_tree(tmp_path_factory):
    """2 nested-path videos x 4 frames in the exact DexYCB on-disk layout."""
    from hoig_tpu.data.synthetic import write_synthetic_obj

    root = tmp_path_factory.mktemp("ycb")
    data_dir = str(root)
    rng = np.random.RandomState(1)

    names = ["002_master_chef_can", "003_cracker_box"]  # OBJNAMES 0, 1
    for i, name in enumerate(names):
        d = os.path.join(data_dir, "models", name)
        os.makedirs(d)
        write_synthetic_obj(os.path.join(d, "textured_pre.obj"), seed=i)

    vids = {
        "20200709-subject-01/20200709_141754/932122060861": 1,  # ycb id 1 -> obj 0
        "20200813-subject-02/20200813_145653/932122060861": 2,  # ycb id 2 -> obj 1
    }
    frames = list(range(4))
    bbx, vids_dict, cam_info = {}, {}, {}
    for vid, ycb_id in vids.items():
        img_dir = os.path.join(data_dir, "images", vid)
        os.makedirs(img_dir)
        bbx[vid] = [80.0, 60.0, 400.0, 380.0]  # x0, y0, x1, y1
        vids_dict[vid] = frames
        cam_info[vid] = {
            "intrinsics": {"fx": 120.0, "fy": 120.0, "ppx": 32.0, "ppy": 32.0},
            "ycb_ids": [14, ycb_id],  # grasped object second in the scene
            "ycb_grasp_ind": 1,
            "mano_betas": (rng.randn(10) * 0.3).tolist(),
        }
        for f in frames:
            img = rng.randint(0, 255, (480, 640, 3), np.uint8)
            cv2.imwrite(os.path.join(img_dir, "color_%06d.jpg" % f), img)
            pose_y = np.zeros((2, 3, 4), np.float32)
            for o in range(2):
                r = cv2.Rodrigues(rng.randn(3).astype(np.float32) * 0.3)[0]
                pose_y[o, :, :3] = r
                pose_y[o, :, 3] = rng.randn(3) * 0.02 + [0, 0, 0.55]
            pose_m = (rng.randn(1, 51) * 0.1).astype(np.float32)
            np.savez(os.path.join(img_dir, "labels_%06d.npz" % f),
                     pose_y=pose_y, pose_m=pose_m)

    os.makedirs(os.path.join(data_dir, "params"))
    for fname, payload in [
        ("DexYCB-bbx.pkl", bbx),
        ("valid_video_info.pkl", cam_info),
        ("DexYCB_train.pkl", vids_dict),
        ("DexYCB_test.pkl", vids_dict),
    ]:
        with open(os.path.join(data_dir, "params", fname), "wb") as fp:
            pickle.dump(payload, fp)
    return dict(data_dir=data_dir)


def _opts(cls, args):
    return cls().parse(args)


# -------------------------------------------------------------------- HOv3
def test_hov3_dataset_getitem_and_collate(hov3_tree):
    from hoig_tpu.data.hov3_dataset import HOv3Dataset
    from hoig_tpu.data.loader import DataLoader
    from hoig_tpu.options.train_options import TrainOptions

    opt = _opts(TrainOptions, [
        "--dataset_mode", "hov3", "--data_dir", hov3_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--obj_dir", hov3_tree["obj_dir"], "--image_size", "64",
        "--num_repeats", "2", "--batch_size", "2", "--num_data_devices", "1",
        "--checkpoints_dir", "/tmp/hov3t", "--name", "t",
    ])
    ds = HOv3Dataset(opt, is_for_train=True)
    ds.set_seed(0)
    assert len(ds) == 2 * 2  # num_videos * num_repeats

    s = ds[0]
    assert s["imageA"].shape == (3, 64, 64) and s["imageA"].dtype == np.float32
    assert s["imageA"].min() >= -1.0 and s["imageA"].max() <= 1.0
    assert s["maskA"].shape == (1, 64, 64)
    m = s["manoA"]
    assert m["cam"].shape == (3, 3) and m["trans"].shape == (2, 3)
    assert m["pose"].shape == (48,) and m["shape"].shape == (10,)
    assert m["handtrans"].shape == (3,)
    assert m["vertices_obj"].shape == (7866, 3)
    assert int(m["obj_id"]) in (0, 1)
    # zero-padding contract (hov3_dataset.py:246): rows past the object are 0
    assert np.all(m["vertices_obj"][100:] == 0)
    assert np.any(m["vertices_obj"][:40] != 0)

    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batch = next(iter(dl))
    assert batch["imageA"].shape == (2, 3, 64, 64)
    assert batch["manoA"]["vertices_obj"].shape == (2, 7866, 3)
    assert batch["nameA"][0].count("/") == 1  # "seq/frame" strings pass through


def test_hov3_eval_pairs_branch(hov3_tree, tmp_path):
    """Pickle pair list drives the eval branch (hov3_dataset.py:204-207)."""
    from hoig_tpu.data.hov3_dataset import HOv3Dataset
    from hoig_tpu.options.test_options import TestOptions

    pairs = [("ABF10_0/0000.jpg", "GPMF11_0/0001.jpg"),
             ("GPMF11_0/0002.jpg", "ABF10_0/0003.jpg")]
    pairs_path = str(tmp_path / "pairs.pkl")
    with open(pairs_path, "wb") as fp:
        pickle.dump(pairs, fp)

    opt = _opts(TestOptions, [
        "--dataset_mode", "hov3", "--data_dir", hov3_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--obj_dir", hov3_tree["obj_dir"], "--image_size", "64",
        "--pairs_dir", pairs_path, "--num_repeats", "1",
        "--checkpoints_dir", "/tmp/hov3t", "--name", "t",
    ])
    ds = HOv3Dataset(opt, is_for_train=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["nameA"] == "ABF10_0/0000.jpg" and s["nameB"] == "GPMF11_0/0001.jpg"
    assert int(s["manoA"]["obj_id"]) == 0 and int(s["manoB"]["obj_id"]) == 1


def test_hov3_full_train_step(hov3_tree, env64):
    """Real-format data through the full jitted GAN step (the VERDICT's
    'one typo in the annotation schema' class of bug dies here)."""
    from hoig_tpu.data.loader import CustomDatasetDataLoader
    from hoig_tpu.geometry.conditioning import ConditioningConfig
    from hoig_tpu.options.train_options import TrainOptions
    from hoig_tpu.train.model_api import ModelsFactory

    opt = _opts(TrainOptions, [
        "--dataset_mode", "hov3", "--data_dir", hov3_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--obj_dir", hov3_tree["obj_dir"], "--image_size", "64",
        "--num_repeats", "1", "--batch_size", "2", "--num_data_devices", "1",
        "--conv_dim", "8", "--repeat_num", "2", "--no_remat", "--use_spade",
        "--checkpoints_dir", "/tmp/hov3t", "--name", "t",
    ])
    env = dict(
        tables_np=env64["tables_np"], tables=env64["tables_np"].as_jax(),
        mano=env64["mano"], mano_params=env64["mano"].as_jax(),
        ccfg=ConditioningConfig(image_size=64), is_ycb=False,
    )
    loader = CustomDatasetDataLoader(opt, is_for_train=True)
    loader._dataset.set_seed(0)
    model = ModelsFactory.get_by_name("trainer", opt, env=env)
    model.set_train()
    batch = next(iter(loader.load_data()))
    model.set_input(batch)
    model.optimize_parameters(trainable=True)
    errors = model.get_current_errors()
    assert all(np.isfinite(v) for v in errors.values()), errors


# --------------------------------------------------------------------- YCB
def test_ycb_dataset_getitem_and_collate(ycb_tree):
    from hoig_tpu.data.loader import DataLoader
    from hoig_tpu.data.ycb_dataset import YCBDataset
    from hoig_tpu.options.train_options import TrainOptions

    opt = _opts(TrainOptions, [
        "--dataset_mode", "ycb", "--data_dir", ycb_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--image_size", "64", "--num_repeats", "3", "--batch_size", "2",
        "--num_data_devices", "1",
        "--checkpoints_dir", "/tmp/ycbt", "--name", "t",
    ])
    ds = YCBDataset(opt, is_for_train=True)
    ds.set_seed(0)
    assert len(ds) == 2 * 3

    s = ds[0]
    assert s["imageA"].shape == (3, 64, 64)
    assert "maskA" not in s  # DexYCB carries no masks (ycb_dataset.py:279-280)
    m = s["manoA"]
    assert m["cam"].shape == (4,)  # fx, fy, cx, cy
    assert m["pose"].shape == (51,)  # 48 PCA/axis-angle ++ 3 translation
    assert m["shape"].shape == (10,)
    assert "handtrans" not in m  # translation rides in pose (hmr.py:85)
    assert m["vertices_obj"].shape == (8000, 3)
    assert int(m["obj_id"]) in (0, 1)
    assert np.all(m["vertices_obj"][100:] == 0)

    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batch = next(iter(dl))
    assert batch["manoA"]["vertices_obj"].shape == (2, 8000, 3)


def test_ycb_eval_pairs_branch(ycb_tree, tmp_path):
    """Nested vid paths + int frames (ycb_dataset.py:84-88)."""
    from hoig_tpu.data.ycb_dataset import YCBDataset
    from hoig_tpu.options.test_options import TestOptions

    va = "20200709-subject-01/20200709_141754/932122060861"
    vb = "20200813-subject-02/20200813_145653/932122060861"
    pairs = [(f"{va}/0", f"{vb}/2")]
    pairs_path = str(tmp_path / "pairs.pkl")
    with open(pairs_path, "wb") as fp:
        pickle.dump(pairs, fp)

    opt = _opts(TestOptions, [
        "--dataset_mode", "ycb", "--data_dir", ycb_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--image_size", "64", "--pairs_dir", pairs_path, "--num_repeats", "1",
        "--checkpoints_dir", "/tmp/ycbt", "--name", "t",
    ])
    ds = YCBDataset(opt, is_for_train=False)
    assert len(ds) == 1
    s = ds[0]
    assert s["nameA"] == f"{va}/0" and s["nameB"] == f"{vb}/2"
    assert int(s["manoA"]["obj_id"]) == 0 and int(s["manoB"]["obj_id"]) == 1


def test_ycb_schema_into_conditioning(ycb_tree, env64):
    """DexYCB sample schema -> hand_recovery_flow, via eval_shape (catches
    any key/shape/dtype mismatch without paying a CPU compile)."""
    from hoig_tpu.data.loader import DataLoader
    from hoig_tpu.data.ycb_dataset import YCBDataset
    from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow
    from hoig_tpu.options.train_options import TrainOptions

    opt = _opts(TrainOptions, [
        "--dataset_mode", "ycb", "--data_dir", ycb_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--image_size", "64", "--num_repeats", "1", "--batch_size", "2",
        "--num_data_devices", "1",
        "--checkpoints_dir", "/tmp/ycbt", "--name", "t",
    ])
    ds = YCBDataset(opt, is_for_train=True)
    ds.set_seed(0)
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batch = next(iter(dl))

    tables = env64["tables_np"].as_jax()
    mano_params = env64["mano"].as_jax()
    ccfg = ConditioningConfig(
        image_size=64, camera_model="fxfy", mano_pca_comps=45,
        mano_flat_hand_mean=False,
    )
    mano_a = {k: jnp.asarray(v) for k, v in batch["manoA"].items()
              if not isinstance(v, list)}
    mano_b = {k: jnp.asarray(v) for k, v in batch["manoB"].items()
              if not isinstance(v, list)}
    shapes = jax.eval_shape(
        lambda: hand_recovery_flow(
            tables, mano_params, jnp.asarray(batch["imageA"]),
            jnp.asarray(batch["imageB"]), mano_a, mano_b, ccfg,
        )
    )
    assert shapes["T"].shape == (2, 64, 64, 2)
    assert shapes["input_G_tsf_hand"].shape[0] == 2


def test_ycb_eval_entry_to_pngs(ycb_tree, env64, tmp_path, monkeypatch):
    """Drive eval.py end-to-end in ycb mode: nested DexYCB video names
    ("subject/seq/cam/frame") through the untiling + stem logic
    (HOIG_DexYCB/eval.py:72-74 joins parts[:-1] with '_') to PNGs on disk.
    Regression test for the r2 crash: `src_vid, src_frame = name.split("/")`
    raised "too many values to unpack" on these names."""
    import eval as eval_entry
    from hoig_tpu.geometry.conditioning import ConditioningConfig

    va = "20200709-subject-01/20200709_141754/932122060861"
    vb = "20200813-subject-02/20200813_145653/932122060861"
    pairs = [(f"{va}/0", f"{vb}/2"), (f"{vb}/1", f"{va}/3"),
             (f"{va}/2", f"{vb}/0")]
    # eval.py hardcodes pairs_dir relative to cwd like the reference
    # (eval.py:32) — run from a tmp cwd carrying assets/eval_pairs.pkl
    run_dir = tmp_path / "run"
    (run_dir / "assets").mkdir(parents=True)
    with open(run_dir / "assets" / "eval_pairs.pkl", "wb") as fp:
        pickle.dump(pairs, fp)
    monkeypatch.chdir(run_dir)

    env = dict(
        tables_np=env64["tables_np"], tables=env64["tables_np"].as_jax(),
        mano=env64["mano"], mano_params=env64["mano"].as_jax(),
        ccfg=ConditioningConfig(
            image_size=64, camera_model="fxfy", mano_pca_comps=45,
            mano_flat_hand_mean=False,
        ),
        is_ycb=True,
    )
    out_dir = str(tmp_path / "out")
    eval_entry.main([
        "--dataset_mode", "ycb", "--data_dir", ycb_tree["data_dir"],
        "--params_dir", "params", "--images_dir", "images",
        "--image_size", "64", "--batch_size", "2", "--num_repeats", "1",
        "--conv_dim", "8", "--repeat_num", "2", "--no_remat", "--use_spade",
        "--checkpoints_dir", str(tmp_path / "ck"), "--name", "t",
        "--output_dir", out_dir,
    ], env=env)

    # 3 pairs at batch 2 -> final batch is partial (exercises the mesh
    # padding path in set_input); every pair must land in all three trees
    for src, tsf in pairs:
        sp, tp = src.split("/"), tsf.split("/")
        stem = f"{'_'.join(sp[:-1])}_{sp[-1]}_{tp[-1]}.png"
        for sub in ("source", "imitators", "gt"):
            path = os.path.join(out_dir, sub, stem)
            assert os.path.exists(path), f"missing {path}"
    import PIL.Image

    im = PIL.Image.open(os.path.join(
        out_dir, "imitators",
        f"{'_'.join(va.split('/'))}_0_2.png"))
    assert im.size == (64, 64)
