"""FVD harness tests: numbered-png clip grouping, self-distance == 0,
divisibility invariant, and the I3D architecture forward."""

import os

import numpy as np
import pytest

from cpcsv_tpu.evaluation.fvd import VideoGenerateDataset, calculate_fvd
from cpcsv_tpu.utils.image import save_all_img


def _dump_clips(path, n_videos, T=10, seed=0):
    rng = np.random.default_rng(seed)
    vids = rng.uniform(-1, 1, (n_videos, T, 64, 64, 3)).astype(np.float32)
    save_all_img(vids, 0, path)
    return vids


def test_video_generate_dataset_grouping(tmp_path):
    p = str(tmp_path / "gen")
    _dump_clips(p, 3, T=10)
    ds = VideoGenerateDataset(p, min_len=10)
    assert len(ds) == 3
    assert ds[0].shape == (10, 64, 64, 3)


def test_fvd_requires_divisible_count(tmp_path):
    with pytest.raises(AssertionError):
        calculate_fvd(str(tmp_path), str(tmp_path), num_of_video=100)


def test_fvd_self_distance_zero(tmp_path):
    gen = str(tmp_path / "gen")
    ref = str(tmp_path / "ref")
    _dump_clips(gen, 16, seed=1)
    _dump_clips(ref, 16, seed=1)  # identical content
    fvd = calculate_fvd(gen, ref, num_of_video=16, batch_size=8)
    assert abs(fvd) < 1e-2


def test_fvd_empty_frame_anchor_131():
    """Reference fvd/fvd.py:16-18: 'The FVD for this setup should be around
    131' — 16 all-zeros videos vs 16 all-ones videos through TRUE Kinetics
    I3D. Only meaningful with real I3D weights; SKIPPED (with a visible
    reason) when none are available in this environment."""
    from cpcsv_tpu.evaluation import weights as W
    from cpcsv_tpu.evaluation.frechet import (
        calculate_activation_statistics,
        calculate_frechet_distance,
    )

    path = W.resolve_weights("i3d_kinetics400")
    if path is None:
        pytest.skip(
            "no Kinetics-400 I3D weights found (checked "
            f"{W.weights_search_dirs()}); the ~131 anchor requires real "
            "weights — port them with tools/port_metric_weights.py"
        )
    from cpcsv_tpu.evaluation.i3d import make_i3d_embedder

    embed = make_i3d_embedder(path)
    # google's demo feeds [0,255]; our embedder takes [-1,1] and shifts
    zeros = np.full((16, 10, 64, 64, 3), -1.0, np.float32)  # black frames
    ones = np.full((16, 10, 64, 64, 3), 1.0, np.float32)  # white frames
    a1 = np.asarray(embed(zeros))
    a2 = np.asarray(embed(ones))
    m1, s1 = calculate_activation_statistics(a1)
    m2, s2 = calculate_activation_statistics(a2)
    fvd = calculate_frechet_distance(m1, s1, m2, s2)
    assert 100.0 < fvd < 165.0, f"empty-frame FVD anchor off: {fvd}"


def test_random_init_extractors_warn():
    """Weights-first guard: building an extractor without weights must raise
    RandomInitMetricWarning and tag the callable."""
    import warnings

    from cpcsv_tpu.evaluation import weights as W
    from cpcsv_tpu.evaluation.r2plus1d import make_fsd_extractor

    if W.resolve_weights("r2plus1d_18") is not None:
        pytest.skip("real weights present; random-init path not reachable")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ex = make_fsd_extractor()
    assert any(issubclass(w.category, W.RandomInitMetricWarning) for w in rec)
    assert ex.random_init is True
    assert ex.fingerprint == "random-init"


def test_i3d_forward_shape():
    import jax
    import jax.numpy as jnp

    from cpcsv_tpu.evaluation.i3d import I3D

    model = I3D(resize_input=False)  # keep 64x64 for test speed
    x = jnp.zeros((2, 10, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 400)
    assert np.isfinite(np.asarray(out)).all()
