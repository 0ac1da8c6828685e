"""Native runtime kernel tests: cv2 parity for the C++ warp/normalize."""

import numpy as np
import pytest

from hoig_tpu.data.dataset_base import gen_trans_from_patch_cv
from hoig_tpu.runtime import get_lib, normalize_chw, warp_affine


@pytest.fixture(scope="module")
def have_native():
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_warp_affine_matches_cv2(rng, have_native):
    import cv2

    src = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    trans = gen_trans_from_patch_cv(300.0, 250.0, 220.0, 180.0, 256, 256, 1.0, 0.0)
    ours = warp_affine(src, trans, (256, 256))
    theirs = cv2.warpAffine(src, trans, (256, 256), flags=cv2.INTER_LINEAR).astype(
        np.float32
    )
    # cv2 uses fixed-point bilinear taps (5-bit fractional weights):
    # tolerance covers the quantization
    np.testing.assert_allclose(ours, theirs, atol=1.5)


def test_warp_affine_border_zero(have_native):
    src = np.full((100, 100, 3), 255, np.uint8)
    # crop a patch far outside the image
    trans = gen_trans_from_patch_cv(500.0, 500.0, 50.0, 50.0, 64, 64, 1.0, 0.0)
    out = warp_affine(src, trans, (64, 64))
    assert np.all(out == 0)


def test_normalize_chw_matches_numpy(rng, have_native):
    patch = (rng.rand(64, 48, 3) * 255).astype(np.float32)
    ours = normalize_chw(patch, swap_rb=True)
    ref = ((patch[:, :, ::-1] / 255.0) * 2.0 - 1.0).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    ours2 = normalize_chw(patch, swap_rb=False, scale=1.0, offset=0.0)
    ref2 = (patch / 255.0).transpose(2, 0, 1)
    np.testing.assert_allclose(ours2, ref2, rtol=1e-6, atol=1e-6)
