"""R(2+1)D-18 weight-converter parity: build a torch model with torchvision's
exact `r2plus1d_18` module layout / state_dict key names (torchvision itself
is not installed), convert with load_torch_r2plus1d_state_dict, and compare
eval-mode forwards at fp32. This is the FSD feature extractor, so converter
correctness == FSD score portability."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from cpcsv_tpu.evaluation.r2plus1d import R2Plus1D18, load_torch_r2plus1d_state_dict


def _midplanes(inp, out):
    return (inp * out * 3 * 3 * 3) // (inp * 3 * 3 + 3 * out)


def conv2plus1d(inp, out, mid, stride=1):
    return nn.Sequential(
        nn.Conv3d(inp, mid, (1, 3, 3), (1, stride, stride), (0, 1, 1), bias=False),
        nn.BatchNorm3d(mid),
        nn.ReLU(inplace=True),
        nn.Conv3d(mid, out, (3, 1, 1), (stride, 1, 1), (1, 0, 0), bias=False),
    )


class BasicBlock(nn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        mid1, mid2 = _midplanes(inp, out), _midplanes(out, out)
        self.conv1 = nn.Sequential(
            conv2plus1d(inp, out, mid1, stride), nn.BatchNorm3d(out), nn.ReLU(inplace=True)
        )
        self.conv2 = nn.Sequential(conv2plus1d(out, out, mid2), nn.BatchNorm3d(out))
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv3d(inp, out, 1, (stride, stride, stride), bias=False),
                nn.BatchNorm3d(out),
            )

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        return self.relu(out + res)


class TorchR2Plus1D18(nn.Module):
    """torchvision VideoResNet(r2plus1d_18) layout: stem + 4 stages x 2."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            nn.BatchNorm3d(45),
            nn.ReLU(inplace=True),
            nn.Conv3d(45, 64, (3, 1, 1), (1, 1, 1), (1, 0, 0), bias=False),
            nn.BatchNorm3d(64),
            nn.ReLU(inplace=True),
        )
        self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
        self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
        self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
        self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

    def forward(self, x):  # x: (N, 3, T, H, W)
        x = self.stem(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3, 4))  # (N, 512)


def test_r2plus1d_converter_forward_parity():
    torch.manual_seed(0)
    tm = TorchR2Plus1D18().eval()
    # randomize BN running stats so the test exercises the stats conversion
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = load_torch_r2plus1d_state_dict(tm.state_dict())
    model = R2Plus1D18()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 4, 1, 2, 3)).numpy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))

    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-4)
