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


def test_spectral_norm_gradient_matches_torch():
    """torch's spectral_norm computes sigma = u @ W @ v with W NOT detached,
    so the weight gradient carries a -(W/sigma^2) u v^T term. Stopping the
    gradient through sigma (an earlier version here) drops ~10% of the
    gradient — this pins the full d(loss)/dW against real torch."""
    torch.manual_seed(7)
    lin = torch.nn.utils.spectral_norm(torch.nn.Linear(6, 5, bias=False))
    x = torch.randn(4, 6)
    # converge u/v in place (as in any trained checkpoint), then one
    # training-mode forward (one more power iteration on both sides)
    with torch.no_grad():
        for _ in range(200):
            lin(x)
    loss = lin(x).square().sum()
    loss.backward()
    t_grad = lin.weight_orig.grad.numpy()  # (out=5, in=6)
    u = lin.weight_u.detach().numpy()

    kernel = jnp.asarray(lin.weight_orig.detach().numpy().T)  # ours: (in, out)

    def loss_fn(k):
        sigma, _ = spectral_normalize(k.T, jnp.asarray(u), update=True)
        y = jnp.asarray(x.numpy()) @ (k / sigma)
        return jnp.sum(jnp.square(y))

    with jax.default_matmul_precision("highest"):
        grad = np.asarray(jax.grad(loss_fn)(kernel)).T  # back to (out, in)
    np.testing.assert_allclose(grad, t_grad, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("rows", [6, 48])
def test_batchnorm_running_stats_match_torch(rows):
    """Running stats after train-mode steps must match torch's: torch stores
    the UNBIASED (Bessel-corrected) batch variance in running_var while flax
    stores the biased one — TorchBatchNorm closes that gap (visible on the
    Dense BN heads, where M = batch rows)."""
    from cpcsv_tpu.ops.blocks import make_batchnorm

    rng = np.random.default_rng(8)
    C = 5
    xs = [rng.standard_normal((rows, C)).astype(np.float32) * 3 + 1 for _ in range(3)]

    bn = make_batchnorm(name="bn")
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]),
                        use_running_average=False)
    t_bn = torch.nn.BatchNorm1d(C)
    with torch.no_grad():
        t_bn.weight.copy_(torch.from_numpy(np.asarray(variables["params"]["scale"])))
        t_bn.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["bias"])))
    t_bn.train()

    stats = variables["batch_stats"]
    for x in xs:
        y, mut = bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), use_running_average=False, mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        with torch.no_grad():
            t_y = t_bn(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(y), t_y.numpy(), rtol=2e-4, atol=2e-5)

    np.testing.assert_allclose(
        np.asarray(stats["mean"]), t_bn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), t_bn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def test_dfn_pallas_tile_choice_terminates():
    """Tile selection for the Pallas DFN kernel: must terminate and satisfy
    the grid/divisibility constraints for ALL batch sizes — b=8200 (8-padded
    quotient 1025, odd) used to loop forever at trace time."""
    from cpcsv_tpu.ops.pallas.dfn import _choose_tile

    for b in (1, 5, 8, 90, 8192, 8200, 16384, 100_001):
        tb, bp = _choose_tile(b)
        assert tb >= 8 and (tb & (tb - 1)) == 0  # power of two
        assert bp >= b and bp % tb == 0
        assert bp // tb <= 1024
