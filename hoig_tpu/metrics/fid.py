"""FID score (reference metrics/pytorch_fid/fid_score.py parity).

Pool3 activations from the FID InceptionV3 -> mean/cov -> Fréchet distance
with scipy.linalg.sqrtm, including the singular-product eps fallback and
the imaginary-component check (fid_score.py:147-200). CLI:
`python -m hoig_tpu.metrics.fid path1 path2 [--weights pt_inception.pth]`
mirrors `python -m pytorch_fid path1 path2`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from hoig_tpu.metrics.inception import FIDInceptionV3, load_torch_weights


def make_inception(weights_path: str | None = None):
    model = FIDInceptionV3()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    if weights_path:
        if weights_path.endswith(".npz"):
            state = dict(np.load(weights_path))
        else:
            import torch

            state = torch.load(weights_path, map_location="cpu")
        params = load_torch_weights(params, state)
        print(f"loaded FID inception weights from {weights_path}")
    else:
        print("[warn] FID inception running with random init — values are "
              "NOT comparable FID scores (supply --weights)")
    apply = jax.jit(lambda p, x: model.apply(p, x))
    return lambda x: apply(params, x)


def get_activations(files, model_fn, batch_size: int = 50) -> np.ndarray:
    """Images (paths) -> (N, 2048) pool3 activations.

    Uses raw [0,1] tensors like pytorch-fid's TF.ToTensor pipeline
    (fid_score.py:115); the net resizes/normalizes internally.
    """
    from PIL import Image

    if batch_size > len(files):
        print("Warning: batch size is bigger than the data size. "
              "Setting batch size to data size")
        batch_size = len(files)
    preds = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        imgs = np.stack(
            [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
             for f in chunk]
        )
        # pad the tail so the jit signature stays fixed
        n = imgs.shape[0]
        if n < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n,) + imgs.shape[1:], np.float32)]
            )
        act = np.asarray(model_fn(jnp.asarray(imgs)))[:n]
        preds.append(act)
    return np.concatenate(preds, axis=0)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Numpy Fréchet distance, the exact pytorch-fid formulation."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        print(f"fid calculation produces singular product; adding {eps} to "
              "diagonal of cov estimates")
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "Imaginary component {}".format(np.max(np.abs(covmean.imag)))
            )
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def calculate_activation_statistics(files, model_fn, batch_size: int = 50):
    act = get_activations(files, model_fn, batch_size)
    return np.mean(act, axis=0), np.cov(act, rowvar=False)


def compute_statistics_of_path(path, model_fn, batch_size: int = 50):
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    return calculate_activation_statistics(files, model_fn, batch_size)


def calculate_fid_given_paths(paths, batch_size: int = 50,
                              weights_path: str | None = None) -> float:
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    model_fn = make_inception(weights_path)
    m1, s1 = compute_statistics_of_path(paths[0], model_fn, batch_size)
    m2, s2 = compute_statistics_of_path(paths[1], model_fn, batch_size)
    return calculate_frechet_distance(m1, s1, m2, s2)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("path", nargs=2)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--weights", type=str, default=None,
                   help="pt_inception-2015-12-05 state dict (.pth/.npz)")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    fid = calculate_fid_given_paths(args.path, args.batch_size, args.weights)
    print("FID: ", fid)


if __name__ == "__main__":
    main()
