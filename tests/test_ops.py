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


@pytest.mark.parametrize("C", [5, 128, 384, 4100])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_mxu_moments_matches_numpy(C, dtype):
    """All three shape paths of the MXU moment kernel (full gram for odd
    C<=4096, grouped batched gram for C%128==0, pad-then-group for odd
    C>4096) must reproduce fp64 numpy moments of the same values."""
    from cpcsv_tpu.ops.blocks import mxu_moments

    rng = np.random.default_rng(11)
    M = 97
    x = (rng.standard_normal((M, C)) * 2 + 0.5).astype(np.float32)
    xj = jnp.asarray(x, getattr(jnp, dtype))
    x64 = np.asarray(xj, np.float64)  # moments of the values actually fed

    mean, mean_sq = jax.jit(mxu_moments)(xj)
    assert mean.dtype == jnp.float32 and mean_sq.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mean), x64.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mean_sq), (x64**2).mean(0), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_mxu_batchnorm_matches_xla_backend(dtype):
    """BN_BACKEND='mxu' must be a pure relowering: train-mode outputs,
    updated running stats, eval-mode outputs, and input gradients all match
    the flax/XLA backend on a 4D NHWC tensor (fp32 to summation-order
    round-off — the near-zero normalize gradients cancel at ~1e-6 scale;
    bf16 to bf16 resolution, since bf16*bf16 products are exact in fp32
    accumulation)."""
    from cpcsv_tpu.ops.blocks import make_batchnorm

    rng = np.random.default_rng(12)
    x = (rng.standard_normal((4, 6, 6, 129)) * 3 + 1).astype(np.float32)
    xj = jnp.asarray(x, getattr(jnp, dtype))
    tol = dict(rtol=1e-4, atol=1e-5) if dtype == "float32" else dict(rtol=2e-2, atol=2e-2)

    outs = {}
    for backend in ("xla", "mxu"):
        bn = make_batchnorm(dtype=getattr(jnp, dtype), name="bn", backend=backend)
        variables = bn.init(jax.random.PRNGKey(0), xj, use_running_average=False)

        @jax.jit
        def train_step(v, x, bn=bn):
            def f(x):
                y, mut = bn.apply(v, x, use_running_average=False,
                                  mutable=["batch_stats"])
                return jnp.sum(jnp.square(y.astype(jnp.float32))), (y, mut)
            (_, (y, mut)), grad = jax.value_and_grad(f, has_aux=True)(x)
            return y, mut["batch_stats"], grad

        y, stats, grad = train_step(variables, xj)
        y_eval = jax.jit(
            lambda v, x, bn=bn: bn.apply(v, x, use_running_average=True)
        )({"params": variables["params"], "batch_stats": stats}, xj)
        outs[backend] = jax.tree.map(
            lambda a: np.asarray(a, np.float32), (y, stats, grad, y_eval)
        )

    for a, b in zip(jax.tree.leaves(outs["xla"]), jax.tree.leaves(outs["mxu"])):
        np.testing.assert_allclose(a, b, **tol)


def test_mxu_batchnorm_honors_use_fast_variance_false():
    """MxuBatchNorm(use_fast_variance=False) must fall back to flax's
    two-pass E[(x-mu)^2] — mxu_moments is inherently the fast-variance
    formula, so silently serving it under the flag would be the
    catastrophic-cancellation case the flag exists to avoid (round-5
    review finding). Pinned with a large-mean input where the two formulas
    measurably differ in bf16 reduction dtype."""
    from cpcsv_tpu.ops.blocks import MxuBatchNorm, TorchBatchNorm, bn_scale_init

    rng = np.random.default_rng(13)
    x = (rng.standard_normal((64, 128)) * 0.1 + 300.0).astype(np.float32)
    xj = jnp.asarray(x)

    kwargs = dict(
        use_running_average=False, momentum=0.9, epsilon=1e-5,
        scale_init=bn_scale_init, use_fast_variance=False, name="bn",
    )
    mxu = MxuBatchNorm(**kwargs)
    ref = TorchBatchNorm(**kwargs)
    v = mxu.init(jax.random.PRNGKey(0), xj)

    y_mxu, st_mxu = jax.jit(
        lambda v, x: mxu.apply(v, x, mutable=["batch_stats"])
    )(v, xj)
    y_ref, st_ref = jax.jit(
        lambda v, x: ref.apply(v, x, mutable=["batch_stats"])
    )(v, xj)
    np.testing.assert_array_equal(np.asarray(y_mxu), np.asarray(y_ref))
    for a, b in zip(jax.tree.leaves(st_mxu), jax.tree.leaves(st_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
