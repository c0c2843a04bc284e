"""Metric tests: Frechet self-distance == 0, SSIM properties, FID/FSD
harnesses on random-feature extractors (reference test strategy: the
self-distance sanity checks of fid/fid_score.py:228-231 etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.evaluation.frechet import (
    calculate_activation_statistics,
    calculate_frechet_distance,
    frechet_from_activations,
)
from cpcsv_tpu.evaluation.inception_score import inception_score_from_probs
from cpcsv_tpu.evaluation.ssim import ssim


def test_frechet_self_distance_zero():
    rng = np.random.default_rng(0)
    act = rng.standard_normal((200, 16))
    mu, sigma = calculate_activation_statistics(act)
    d = calculate_frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-6


def test_frechet_known_value_identity_covs():
    # mu diff only, identity covariances -> d = |mu1-mu2|^2
    D = 8
    mu1, mu2 = np.zeros(D), np.ones(D) * 2.0
    eye = np.eye(D)
    d = calculate_frechet_distance(mu1, eye, mu2, eye)
    assert abs(d - 4.0 * D) < 1e-6


def test_frechet_from_activations_separates_distributions():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8)) + 3.0
    assert frechet_from_activations(a, b) > frechet_from_activations(a, a + 0.0)


def test_frechet_matches_torch_reference_pipeline():
    """Cross-check against the exact numpy algebra the reference uses."""
    from scipy import linalg

    rng = np.random.default_rng(2)
    a1 = rng.standard_normal((300, 12))
    a2 = rng.standard_normal((300, 12)) * 1.5 + 0.5
    mu1, s1 = a1.mean(0), np.cov(a1, rowvar=False)
    mu2, s2 = a2.mean(0), np.cov(a2, rowvar=False)
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    ref = (mu1 - mu2).dot(mu1 - mu2) + np.trace(s1) + np.trace(s2) - 2 * np.trace(
        covmean.real
    )
    ours = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert abs(ours - ref) < 1e-8


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    noisy = img + jnp.asarray(rng.normal(0, 0.3, img.shape).astype(np.float32))
    assert float(ssim(img, noisy)) < 0.8


def test_ssim_matches_pytorch_ssim_formula():
    """Golden check vs a direct torch implementation of pytorch-ssim."""
    import torch
    import torch.nn.functional as F

    def torch_ssim(img1, img2, window_size=11):
        sigma = 1.5
        g = torch.exp(
            -((torch.arange(window_size).float() - window_size // 2) ** 2)
            / (2 * sigma**2)
        )
        g = (g / g.sum()).unsqueeze(0)
        window_2d = (g.t() @ g).unsqueeze(0).unsqueeze(0)
        C = img1.shape[1]
        window = window_2d.expand(C, 1, window_size, window_size)
        pad = window_size // 2
        mu1 = F.conv2d(img1, window, padding=pad, groups=C)
        mu2 = F.conv2d(img2, window, padding=pad, groups=C)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, padding=pad, groups=C) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, padding=pad, groups=C) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, padding=pad, groups=C) - mu1_mu2
        C1, C2 = 0.01**2, 0.03**2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
        )
        return float(m.mean())

    rng = np.random.default_rng(4)
    a = rng.random((2, 16, 16, 3)).astype(np.float32)
    b = rng.random((2, 16, 16, 3)).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(
        torch.tensor(a).permute(0, 3, 1, 2), torch.tensor(b).permute(0, 3, 1, 2)
    )
    assert abs(ours - ref) < 2e-4


def test_inception_score_uniform_vs_peaked():
    N, C = 100, 10
    uniform = np.full((N, C), 1.0 / C)
    is_u, _ = inception_score_from_probs(uniform, splits=5)
    assert abs(is_u - 1.0) < 1e-5
    peaked = np.eye(C)[np.arange(N) % C]
    is_p, _ = inception_score_from_probs(peaked * 0.999 + 1e-4, splits=5)
    assert is_p > 5.0


class _ArrayDataset:
    def __init__(self, arr):
        self.arr = arr

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        return self.arr[i]


def test_fid_fsd_self_distance_zero_random_extractors():
    """FID/FSD harness with random-init extractors: same data on both sides
    must give ~0 (reference self-distance test idiom)."""
    from cpcsv_tpu.evaluation.fid import fid_score
    from cpcsv_tpu.evaluation.fsd import fsd_score

    rng = np.random.default_rng(5)
    imgs = _ArrayDataset(rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32))
    d = fid_score(imgs, imgs, batch_size=8, normalize=True)
    assert abs(d) < 1e-3

    stories = _ArrayDataset(rng.uniform(-1, 1, (8, 5, 64, 64, 3)).astype(np.float32))
    d = fsd_score(stories, stories, batch_size=4)
    assert abs(d) < 1e-3
