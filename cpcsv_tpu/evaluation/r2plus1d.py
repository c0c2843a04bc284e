"""R(2+1)D-18 in Flax — the FSD (Frechet Story Distance) feature extractor.

Re-implementation of torchvision's `r2plus1d_18` video ResNet as used by the
reference for its novel metric (`fid/vfid_score.py:154-174`,
`fid/residual2p1.py:9-50`, vendored copy `story_fid_model.py:19-376`):
stem + 4 stages of 2 (2+1)D basic blocks + global average pool -> 512-d.

Reference quirk preserved (documented, `fid/residual2p1.py:36-49`): the
wrapper computes a 112x112 resize + [-1,1] rescale of the input but then
feeds the RAW input to the network — the preprocessing is dead code. So FSD
features are computed directly on the [-1,1]-normalized 64x64 stories.
`fix_preprocessing=True` enables the (intended) resize+rescale path.

Weights: `load_torch_r2plus1d_state_dict` converts a torchvision
r2plus1d_18 state_dict (Kinetics-400 pretrained .pth supplied by the user;
no network access here). Random init suffices for self-distance==0 tests.

Input: (N, T, H, W, 3) NDHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9, name=name)


def _conv3d(features, kernel, strides, padding, name):
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=tuple((p, p) for p in padding),
        use_bias=False,
        name=name,
    )


def _midplanes(inplanes: int, planes: int) -> int:
    return (inplanes * planes * 3 * 3 * 3) // (inplanes * 3 * 3 + 3 * planes)


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial conv -> BN -> ReLU -> (3,1,1) temporal conv."""

    planes: int
    midplanes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = self.stride
        x = _conv3d(self.midplanes, (1, 3, 3), (1, s, s), (0, 1, 1), "spatial")(x)
        x = _bn("bn")(x)
        x = nn.relu(x)
        x = _conv3d(self.planes, (3, 1, 1), (s, 1, 1), (1, 0, 0), "temporal")(x)
        return x


class BasicBlock(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        mid1 = _midplanes(self.inplanes, self.planes)
        mid2 = _midplanes(self.planes, self.planes)
        residual = x
        out = Conv2Plus1D(self.planes, mid1, self.stride, name="conv1")(x)
        out = _bn("bn1")(out)
        out = nn.relu(out)
        out = Conv2Plus1D(self.planes, mid2, 1, name="conv2")(out)
        out = _bn("bn2")(out)
        if self.stride != 1 or self.inplanes != self.planes:
            s = self.stride
            residual = _conv3d(
                self.planes, (1, 1, 1), (s, s, s), (0, 0, 0), "ds_conv"
            )(x)
            residual = _bn("ds_bn")(residual)
        return nn.relu(out + residual)


class R2Plus1D18(nn.Module):
    """(N, T, H, W, 3) -> (N, 512) pooled features."""

    fix_preprocessing: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fix_preprocessing:
            N, T, H, W, C = x.shape
            x = jax.image.resize(x, (N, T, 112, 112, C), method="bilinear")
            x = 2.0 * x - 1.0
        # stem
        x = _conv3d(45, (1, 7, 7), (1, 2, 2), (0, 3, 3), "stem0")(x)
        x = _bn("stem0_bn")(x)
        x = nn.relu(x)
        x = _conv3d(64, (3, 1, 1), (1, 1, 1), (1, 0, 0), "stem1")(x)
        x = _bn("stem1_bn")(x)
        x = nn.relu(x)
        # stages
        planes = [64, 128, 256, 512]
        inplanes = 64
        for stage, p in enumerate(planes):
            for blk in range(2):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = BasicBlock(inplanes, p, stride, name=f"layer{stage+1}_{blk}")(x)
                inplanes = p
        return x.mean(axis=(1, 2, 3))  # adaptive avg pool -> (N, 512)


# --------------------------------------------------------------------------
def load_torch_r2plus1d_state_dict(state_dict) -> dict:
    """Convert torchvision r2plus1d_18 weights to this module's variables."""
    params: dict = {}
    stats: dict = {}

    def arr(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def conv_w(t):
        # torch (O, I, T, H, W) -> flax (T, H, W, I, O)
        return arr(t).transpose(2, 3, 4, 1, 0)

    def bn_into(dst_path, prefix):
        put(params, dst_path + ["scale"], arr(state_dict[prefix + ".weight"]))
        put(params, dst_path + ["bias"], arr(state_dict[prefix + ".bias"]))
        put(stats, dst_path + ["mean"], arr(state_dict[prefix + ".running_mean"]))
        put(stats, dst_path + ["var"], arr(state_dict[prefix + ".running_var"]))

    put(params, ["stem0", "kernel"], conv_w(state_dict["stem.0.weight"]))
    bn_into(["stem0_bn"], "stem.1")
    put(params, ["stem1", "kernel"], conv_w(state_dict["stem.3.weight"]))
    bn_into(["stem1_bn"], "stem.4")

    for stage in range(1, 5):
        for blk in range(2):
            t_prefix = f"layer{stage}.{blk}"
            f_prefix = f"layer{stage}_{blk}"
            for conv_idx in (1, 2):
                tp = f"{t_prefix}.conv{conv_idx}.0"
                fp = [f_prefix, f"conv{conv_idx}"]
                put(params, fp + ["spatial", "kernel"], conv_w(state_dict[tp + ".0.weight"]))
                bn_into(fp + ["bn"], tp + ".1")
                put(params, fp + ["temporal", "kernel"], conv_w(state_dict[tp + ".3.weight"]))
                bn_into([f_prefix, f"bn{conv_idx}"], f"{t_prefix}.conv{conv_idx}.1")
            if f"{t_prefix}.downsample.0.weight" in state_dict:
                put(
                    params,
                    [f_prefix, "ds_conv", "kernel"],
                    conv_w(state_dict[f"{t_prefix}.downsample.0.weight"]),
                )
                bn_into([f_prefix, "ds_bn"], f"{t_prefix}.downsample.1")
    return {"params": params, "batch_stats": stats}


def make_fsd_extractor(weights_path: str | None = None):
    """Returns a jitted fn stories(N,T,H,W,3) -> (N, 512) features.

    Weights resolve through evaluation.weights; absent weights trigger
    RandomInitMetricWarning and tag the extractor `random_init=True`."""
    from cpcsv_tpu.evaluation import weights as W

    model = R2Plus1D18()
    path = W.resolve_weights("r2plus1d_18", weights_path)
    if path:
        variables = load_torch_r2plus1d_state_dict(W.load_state_dict(path))
    else:
        W.warn_random_init("r2plus1d_18")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 64, 3)))

    @jax.jit
    def _extract(x):
        return model.apply(variables, x)

    def extract(x):
        return _extract(x)

    extract.random_init = path is None
    extract.fingerprint = W.weights_fingerprint(path)
    extract.backbone = "r2plus1d"
    return extract
