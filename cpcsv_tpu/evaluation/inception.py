"""InceptionV3 (FID variant) in Flax — jitted pool3 feature extractor.

Re-implementation of the architecture the reference uses for FID
(`fid/inception.py:16-310`, the mseitzer/pytorch-fid port of torchvision
InceptionV3 with the FID-specific weight file `pt_inception-2015-12-05`):
  * BasicConv2d = conv(bias=False) + BN(eps=1e-3) + ReLU
  * FID mods: InceptionA/C/E use average pooling with
    count_include_pad=False; the final E block uses MAX pooling.
  * input: bilinear resize to 299x299 (half-pixel centers), values scaled
    from [0,1] to [-1,1]; output: 2048-d pool3 features.

Weights: `load_torch_inception_state_dict` converts a torch state_dict
(the pt_inception-2015-12-05 .pth, loaded with torch on CPU) into flax
params. Without a weight file the network runs with random init — enough
for self-distance==0 tests, NOT for comparable FID numbers.

Module names mirror the torch module paths so conversion is mechanical.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_3x3_exclude_pad(x: jnp.ndarray) -> jnp.ndarray:
    """torch AvgPool2d(3, stride=1, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_pool = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return sum_pool / counts


def _max_pool(x, window, stride, padding=((0, 0), (0, 0))):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), *padding, (0, 0)],
    )


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _p(h, w):
    return ((h, h), (w, w))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_p(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_p(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_p(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_p(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_p(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_p(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_p(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID: last block pools with max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=_p(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=_p(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=_p(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=_p(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.use_max_pool:
            bp = _max_pool(x, 3, 1, _p(1, 1))
        else:
            bp = _avg_pool_3x3_exclude_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Input: (N, H, W, 3) in [0, 1]. Output: (N, 2048) pool3 features."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_p(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(use_max_pool=False, name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # adaptive avg pool -> (N, 2048)


# --------------------------------------------------------------------------
def load_torch_inception_state_dict(state_dict) -> dict:
    """Convert a torch InceptionV3(FID) state_dict to flax variables
    {'params': ..., 'batch_stats': ...}. Accepts either plain torchvision
    naming ('Mixed_5b.branch1x1.conv.weight') or pytorch-fid block naming."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], arr.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["scale"], arr)
            elif parts[-1] == "bias":
                put(params, parts[:-1] + ["bias"], arr)
            elif parts[-1] == "running_mean":
                put(stats, parts[:-1] + ["mean"], arr)
            elif parts[-1] == "running_var":
                put(stats, parts[:-1] + ["var"], arr)
        # fc / AuxLogits weights are unused for pool3 features
    return {"params": params, "batch_stats": stats}


def make_inception_classifier(weights_path: str | None = None, num_classes: int = 1008):
    """pool3 features + the checkpoint's fc head -> logits (for the
    Inception Score, reference fid/inception_score.py). The FID weight file
    carries a 1008-way fc (mseitzer pt_inception head)."""
    from cpcsv_tpu.evaluation import weights as W

    model = InceptionV3FID()
    fc_w = fc_b = None
    path = W.resolve_weights("inception_fid", weights_path)
    if path:
        sd = W.load_state_dict(path)
        variables = load_torch_inception_state_dict(sd)
        if "fc.weight" in sd:
            fc_w = np.asarray(sd["fc.weight"]).T  # (2048, C)
            fc_b = np.asarray(sd["fc.bias"])
    else:
        W.warn_random_init("inception_fid")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fc_random = fc_w is None
    if fc_random:
        if path is not None:
            import warnings

            warnings.warn(
                f"weights file {path} has no fc.weight — the Inception-Score "
                "classification head is RANDOM; the result is tagged "
                "random_init=True",
                stacklevel=2,
            )
        rng = np.random.default_rng(0)
        fc_w = (rng.standard_normal((2048, num_classes)) * 0.02).astype(np.float32)
        fc_b = np.zeros((num_classes,), np.float32)
    fc_w, fc_b = jnp.asarray(fc_w), jnp.asarray(fc_b)

    @jax.jit
    def _classify(x):
        feats = model.apply(variables, x)
        return feats @ fc_w + fc_b

    def classify(x):
        return _classify(x)

    # random whenever EITHER the trunk or the fc head lacks real weights —
    # a trunk-only checkpoint must not masquerade as a real IS
    classify.random_init = path is None or fc_random
    classify.fingerprint = W.weights_fingerprint(path)
    return classify


def make_inception_extractor(weights_path: str | None = None):
    """Returns a jitted fn images(N,H,W,3 in [0,1]) -> (N, 2048) features.

    Weights resolve through evaluation.weights (explicit path ->
    $CPCSV_METRIC_WEIGHTS_DIR -> ~/.cache/cpcsv_tpu/weights, .npz or .pth);
    absent weights trigger RandomInitMetricWarning and tag the extractor
    `random_init=True` so scores can never silently pass as real FID."""
    from cpcsv_tpu.evaluation import weights as W

    model = InceptionV3FID()
    path = W.resolve_weights("inception_fid", weights_path)
    if path:
        variables = load_torch_inception_state_dict(W.load_state_dict(path))
    else:
        W.warn_random_init("inception_fid")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def _extract(x):
        return model.apply(variables, x)

    def extract(x):
        return _extract(x)

    extract.random_init = path is None
    extract.fingerprint = W.weights_fingerprint(path)
    extract.backbone = "inception_fid"
    return extract
