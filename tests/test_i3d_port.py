"""I3D weight-converter parity: torch replica of the piergiaj/pytorch-i3d
`InceptionI3d` layout (TF-SAME padding semantics), converted with
load_torch_i3d_state_dict, eval forwards compared at fp32 — the true-FVD
embedder path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cpcsv_tpu.evaluation.i3d import (
    I3D,
    load_tf_i3d_variables,
    load_torch_i3d_state_dict,
)


def _same_pad(size, kernel, stride):
    out = -(-size // stride)
    return max(0, (out - 1) * stride + kernel - size)


def _pad_same_3d(x, kernel, stride):
    # x: (N, C, T, H, W)
    pads = []
    for dim, k, s in zip(x.shape[2:], kernel, stride):
        p = _same_pad(dim, k, s)
        pads.append((p // 2, p - p // 2))
    (pt, pt2), (ph, ph2), (pw, pw2) = pads
    return F.pad(x, (pw, pw2, ph, ph2, pt, pt2))


class Unit3D(nn.Module):
    def __init__(self, inp, out, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, activation=True, use_bias=False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = nn.Conv3d(inp, out, kernel, stride, 0, bias=use_bias)
        self.bn = nn.BatchNorm3d(out, eps=1e-3) if use_bn else None
        self.activation = activation

    def forward(self, x):
        x = self.conv3d(_pad_same_3d(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.activation else x


def max_pool_same(x, kernel, stride):
    return F.max_pool3d(_pad_same_3d(x, kernel, stride), kernel, stride)


class Block(nn.Module):
    def __init__(self, inp, b0, b1, b2, b3):
        super().__init__()
        self.b0 = Unit3D(inp, b0)
        self.b1a = Unit3D(inp, b1[0])
        self.b1b = Unit3D(b1[0], b1[1], (3, 3, 3))
        self.b2a = Unit3D(inp, b2[0])
        self.b2b = Unit3D(b2[0], b2[1], (3, 3, 3))
        self.b3b = Unit3D(inp, b3)

    def forward(self, x):
        return torch.cat(
            [
                self.b0(x),
                self.b1b(self.b1a(x)),
                self.b2b(self.b2a(x)),
                self.b3b(max_pool_same(x, (3, 3, 3), (1, 1, 1))),
            ],
            1,
        )


_CFG = {
    "Mixed_3b": (192, 64, (96, 128), (16, 32), 32),
    "Mixed_3c": (256, 128, (128, 192), (32, 96), 64),
    "Mixed_4b": (480, 192, (96, 208), (16, 48), 64),
    "Mixed_4c": (512, 160, (112, 224), (24, 64), 64),
    "Mixed_4d": (512, 128, (128, 256), (24, 64), 64),
    "Mixed_4e": (512, 112, (144, 288), (32, 64), 64),
    "Mixed_4f": (528, 256, (160, 320), (32, 128), 128),
    "Mixed_5b": (832, 256, (160, 320), (32, 128), 128),
    "Mixed_5c": (832, 384, (192, 384), (48, 128), 128),
}


class TorchI3D(nn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = Unit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = Unit3D(64, 64)
        self.Conv3d_2c_3x3 = Unit3D(64, 192, (3, 3, 3))
        for name, (inp, b0, b1, b2, b3) in _CFG.items():
            setattr(self, name, Block(inp, b0, b1, b2, b3))
        self.logits = Unit3D(1024, num_classes, use_bn=False, activation=False, use_bias=True)

    def forward(self, x):  # x (N, 3, T, H, W) in [-1, 1]
        x = self.Conv3d_1a_7x7(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, n)(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        # piergiaj InceptionI3d / kinetics-i3d logits head: avg_pool3d
        # window (2,7,7) stride 1 VALID, 1x1x1 conv, temporal mean (the
        # spatial mean below equals the 7x7 spatial window at 224 input)
        x = x.mean(dim=(3, 4), keepdim=True)  # spatial avg, keep time
        if x.shape[2] >= 2:
            x = F.avg_pool3d(x, (2, 1, 1), (1, 1, 1))
        x = self.logits(x)
        return x.mean(dim=2).flatten(1)  # (N, 400)


# T=10 downsamples to post-stem temporal extent 2 where the temporal
# window-2 pool is algebraically a plain mean; T=20 gives extent 3, where
# the endpoint-vs-interior weighting is live — this case guards the head.
@pytest.mark.parametrize("frames", [10, 20])
def test_i3d_converter_forward_parity(frames):
    torch.manual_seed(0)
    tm = TorchI3D().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)

    variables = load_torch_i3d_state_dict(tm.state_dict())
    model = I3D(resize_input=False, normalize_input=False)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, frames, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 4, 1, 2, 3)).numpy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))

    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-3)


# -- TF-Hub variable-map ingestion (the reference's NATIVE FVD artifact, --
# -- fvd/frechet_video_distance.py:55-70) ---------------------------------

# torch-replica unit name -> (TF branch dir, TF conv name); Mixed_5b's
# Branch_2 3x3 conv carries the checkpoint's real misnaming `Conv3d_0a_3x3`
# so the kernel-suffix dispatch is pinned, not just the happy path.
_TF_UNIT_NAMES = {
    "b0": ("Branch_0", "Conv3d_0a_1x1"),
    "b1a": ("Branch_1", "Conv3d_0a_1x1"),
    "b1b": ("Branch_1", "Conv3d_0b_3x3"),
    "b2a": ("Branch_2", "Conv3d_0a_1x1"),
    "b2b": ("Branch_2", "Conv3d_0b_3x3"),
    "b3b": ("Branch_3", "Conv3d_0b_1x1"),
}


def _tf_varmap_from_torch(tm: "TorchI3D") -> dict:
    """Write the torch replica's weights under the TF-Hub module's variable
    names/layouts: kernels (t,h,w,in,out), broadcast-shaped (1,1,1,1,C) BN
    arrays, center-only BN (no gamma), `module/` prefix + `:0` suffix as
    `tf.Variable.name` yields them."""
    out = {}

    def w5d(t):  # torch (out,in,t,h,w) -> TF (t,h,w,in,out)
        return t.detach().numpy().transpose(2, 3, 4, 1, 0)

    def bcast(t):
        return t.detach().numpy().reshape(1, 1, 1, 1, -1)

    def put_unit(prefix, unit):
        out[f"module/RGB/inception_i3d/{prefix}/conv_3d/w:0"] = w5d(unit.conv3d.weight)
        if unit.conv3d.bias is not None:
            out[f"module/RGB/inception_i3d/{prefix}/conv_3d/b:0"] = (
                unit.conv3d.bias.detach().numpy()
            )
        if unit.bn is not None:
            bn = unit.bn
            out[f"module/RGB/inception_i3d/{prefix}/batch_norm/beta:0"] = bcast(bn.bias)
            out[f"module/RGB/inception_i3d/{prefix}/batch_norm/moving_mean:0"] = bcast(
                bn.running_mean
            )
            out[
                f"module/RGB/inception_i3d/{prefix}/batch_norm/moving_variance:0"
            ] = bcast(bn.running_var)

    for stem in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        put_unit(stem, getattr(tm, stem))
    for mixed in _CFG:
        for unit_name, (branch, conv) in _TF_UNIT_NAMES.items():
            if mixed == "Mixed_5b" and unit_name == "b2b":
                conv = "Conv3d_0a_3x3"  # the checkpoint's known quirk
            put_unit(f"{mixed}/{branch}/{conv}", getattr(getattr(tm, mixed), unit_name))
    put_unit("Logits/Conv3d_0c_1x1", tm.logits)
    return out


def test_i3d_tf_varmap_ingestion(tmp_path):
    """The TF-Hub-layout reader produces the same forward as the torch
    state_dict converter, end to end through the npz + auto-dispatch path."""
    torch.manual_seed(1)
    tm = TorchI3D().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
                m.weight.fill_(1.0)  # TF-Hub i3d BN is center-only (no gamma)

    npz = tmp_path / "i3d_tfhub_kinetics400.npz"
    np.savez(npz, **_tf_varmap_from_torch(tm))

    from cpcsv_tpu.evaluation.i3d import load_i3d_weights

    variables = load_i3d_weights(str(npz))
    # reader fills the missing gamma with ones
    assert np.all(variables["params"]["Mixed_3b"]["b0"]["bn"]["scale"] == 1.0)

    model = I3D(resize_input=False, normalize_input=False)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 10, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 4, 1, 2, 3)).numpy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-3)

    # and the two converters agree leaf-for-leaf on identical sources
    torch_vars = load_torch_i3d_state_dict(tm.state_dict())
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(torch_vars))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(leaf, flat_b[path], rtol=1e-6, atol=1e-6)
