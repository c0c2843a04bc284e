"""Frechet distance math — bit-faithful to the reference
(`fid/fid_score.py:107-158`, itself the mseitzer/pytorch-fid port):

    d^2 = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))

with the same stabilization: if sqrtm fails to be finite, retry with an
eps*I offset; reject significant imaginary parts. numpy/scipy on host —
the covariances are tiny (2048^2) and sqrtm is not TPU-friendly.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def calculate_activation_statistics(act: np.ndarray):
    """act: (N, D) -> (mu (D,), sigma (D,D)) — reference fid_score.py:96-104."""
    act = np.asarray(act, dtype=np.float64)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))

    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    tr_covmean = np.trace(covmean)
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean
    )


def frechet_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    """Reference story_fid.py:45-118 helper shape."""
    mu1, s1 = calculate_activation_statistics(act1)
    mu2, s2 = calculate_activation_statistics(act2)
    return calculate_frechet_distance(mu1, s1, mu2, s2)
