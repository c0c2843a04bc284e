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
