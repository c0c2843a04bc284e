"""Golden tests for core ops against torch CPU reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cpcsv_tpu.ops.blocks import nearest_upsample_2x
from cpcsv_tpu.ops.dynamic_filter import dynamic_filter_conv1d
from cpcsv_tpu.ops.gru import GRUCell
from cpcsv_tpu.ops.spectral_norm import spectral_normalize


def test_dynamic_filter_matches_torch_conv1d():
    """Our batched einsum == the reference's per-sample F.conv1d loop
    (reference layers.py:69-80)."""
    rng = np.random.default_rng(0)
    B, C, L, K = 7, 3, 124, 21
    image = rng.standard_normal((B, C, L)).astype(np.float32)
    filters = rng.standard_normal((B, 1, C, K)).astype(np.float32)

    out = np.asarray(dynamic_filter_conv1d(jnp.array(image), jnp.array(filters), pad=K // 2))

    t_img = torch.from_numpy(image).unsqueeze(0)  # (1, B, C, L)
    ref = []
    for i in range(B):
        ref.append(F.conv1d(t_img[:, i], torch.from_numpy(filters[i]), padding=K // 2))
    ref = torch.cat(ref, 0).numpy()  # (B, 1, L)

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gru_cell_matches_torch():
    rng = np.random.default_rng(1)
    B, I, H = 4, 10, 6
    x = rng.standard_normal((B, I)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)

    cell = GRUCell(hidden_size=H)
    variables = cell.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(h))
    params = variables["params"]

    t_cell = torch.nn.GRUCell(I, H)
    with torch.no_grad():
        t_cell.weight_ih.copy_(torch.from_numpy(np.asarray(params["w_ih"]).T))
        t_cell.weight_hh.copy_(torch.from_numpy(np.asarray(params["w_hh"]).T))
        t_cell.bias_ih.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        t_cell.bias_hh.copy_(torch.from_numpy(np.asarray(params["b_hh"])))
        ref = t_cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    with jax.default_matmul_precision("highest"):
        out = np.asarray(cell.apply(variables, jnp.array(x), jnp.array(h)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(nearest_upsample_2x(jnp.array(x)))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out, ref)


def test_spectral_normalize_converges_to_top_singular_value():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((16, 32)).astype(np.float32)
    u = np.ones((16,), dtype=np.float32) / 4.0
    sigma = None
    for _ in range(50):
        sigma, u = spectral_normalize(jnp.array(w), jnp.array(u), update=True)
    true_sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(float(sigma) - true_sigma) < 1e-3


def test_spectral_norm_no_update_is_pure():
    rng = np.random.default_rng(4)
    w = jnp.array(rng.standard_normal((8, 8)).astype(np.float32))
    u0 = jnp.array(rng.standard_normal(8).astype(np.float32))
    s1, u1 = spectral_normalize(w, u0, update=False)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0))
