"""Port reference PyTorch checkpoints into this framework's variables:
generators (netG_epoch_*.pth) and discriminators (netD_*_epoch_last.pth,
including torch spectral_norm state). tools/port_reference_run.py wraps
these into a one-command whole-run importer.

Layer layout was designed for 1:1 portability (see models/generator.py):
  * Dense kernels are torch weights transposed
  * conv kernels (O,I,kh,kw) -> (kh,kw,I,O)
  * GRU stacked weights keep torch's [r|z|n] gate order
  * the fc->4x4 reshape keeps torch's channel-major order
  * BatchNorm running stats map to the 'batch_stats' collection

Use: variables = port_generator_state_dict(torch.load(pth, map_location='cpu'), cascade=...)
then net_g.apply(variables, ...) reproduces reference sample_videos at fp32
(pass torch_repeat_quirk=True to the module for bit-exact content tiling).
"""

from __future__ import annotations

import numpy as np


def _arr(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _put(tree, path, leaf):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = leaf


def _dense(params, stats, sd, t_prefix, f_path, has_bn=True, bias=True):
    _put(params, f_path + ["dense", "kernel"], _arr(sd[f"{t_prefix}.0.weight"]).T)
    if bias and f"{t_prefix}.0.bias" in sd:
        _put(params, f_path + ["dense", "bias"], _arr(sd[f"{t_prefix}.0.bias"]))
    if has_bn:
        _bn(params, stats, sd, f"{t_prefix}.1", f_path + ["bn"])


def _bn(params, stats, sd, t_prefix, f_path):
    _put(params, f_path + ["scale"], _arr(sd[f"{t_prefix}.weight"]))
    _put(params, f_path + ["bias"], _arr(sd[f"{t_prefix}.bias"]))
    _put(stats, f_path + ["mean"], _arr(sd[f"{t_prefix}.running_mean"]))
    _put(stats, f_path + ["var"], _arr(sd[f"{t_prefix}.running_var"]))


def _conv(params, sd, t_key, f_path):
    _put(params, f_path + ["kernel"], _arr(sd[t_key]).transpose(2, 3, 1, 0))


def _gru(params, sd, t_prefix, f_path):
    _put(params, f_path + ["w_ih"], _arr(sd[f"{t_prefix}.weight_ih"]).T)
    _put(params, f_path + ["w_hh"], _arr(sd[f"{t_prefix}.weight_hh"]).T)
    _put(params, f_path + ["b_ih"], _arr(sd[f"{t_prefix}.bias_ih"]))
    _put(params, f_path + ["b_hh"], _arr(sd[f"{t_prefix}.bias_hh"]))


def port_generator_state_dict(
    sd: dict, use_segment: bool = True, cascade: bool = False
) -> dict:
    """torch StoryGAN state_dict -> {'params', 'batch_stats'} for
    StoryGenerator (reference model.py:242-311 / cascade_model.py:253-341)."""
    params: dict = {}
    stats: dict = {}

    _put(params, ["ca_net", "fc", "kernel"], _arr(sd["ca_net.fc.weight"]).T)
    _put(params, ["ca_net", "fc", "bias"], _arr(sd["ca_net.fc.bias"]))

    _dense(params, stats, sd, "filter_net", ["filter_net"])
    _dense(params, stats, sd, "image_net", ["image_net"])
    _dense(params, stats, sd, "fc", ["fc"], bias=False)
    _dense(params, stats, sd, "m_net", ["m_net"])
    _dense(params, stats, sd, "c_net", ["c_net"])
    _gru(params, sd, "recurrent", ["recurrent"])
    _gru(params, sd, "mocornn", ["mocornn"])

    for i in (1, 2, 3, 4):
        # torch upBlock Sequential: 0=Upsample, 1=conv, 2=BN
        _conv(params, sd, f"upsample{i}.1.weight", [f"upsample{i}", "conv"])
        _bn(params, stats, sd, f"upsample{i}.2", [f"upsample{i}", "bn"])
    _conv(params, sd, "img.0.weight", ["img"])

    if use_segment:
        _dense(params, stats, sd, "fc_seg", ["fc_seg"], bias=False)
        for i in (1, 2, 3, 4):
            _conv(
                params, sd, f"upsample{i}_seg.1.weight",
                [f"upsample{i}_seg", "conv"],
            )
            _bn(params, stats, sd, f"upsample{i}_seg.2", [f"upsample{i}_seg", "bn"])
        _conv(params, sd, "img_seg.0.weight", ["img_seg"])
        _conv(params, sd, "seg_c.weight", ["seg_c"])
        _conv(params, sd, "seg_c1.weight", ["seg_c1"])
        if cascade:
            _conv(params, sd, "presample.0.weight", ["presample_conv"])
            _bn(params, stats, sd, "presample.1", ["presample_bn"])
            for i in (1, 2, 3, 4):
                # torch downBlock: 0=conv (with bias), 1=BN
                _conv(
                    params, sd, f"downsample{i}_seg.0.weight",
                    [f"downsample{i}_seg", "conv"],
                )
                _put(
                    params,
                    [f"downsample{i}_seg", "conv", "bias"],
                    _arr(sd[f"downsample{i}_seg.0.bias"]),
                )
                _bn(params, stats, sd, f"downsample{i}_seg.1", [f"downsample{i}_seg", "bn"])

    return {"params": params, "batch_stats": stats}


def port_generator_file(path: str, use_segment: bool = True, cascade: bool = False):
    import torch

    sd = torch.load(path, map_location="cpu")
    return port_generator_state_dict(sd, use_segment=use_segment, cascade=cascade)


# ---------------------------------------------------------------------------
# Discriminators (reference netD_{im,st,se}_epoch_last.pth)
# ---------------------------------------------------------------------------
#
# torch spectral_norm stores `weight_orig` (the unnormalized parameter) plus
# `weight_u` / `weight_v` power-iteration buffers. Our SNConv/SNDense keep
# the unnormalized kernel in "params" and only `u` in the "spectral"
# collection (v is recomputed from u each forward, ops/spectral_norm.py) —
# so port weight_orig -> kernel and weight_u -> u and drop weight_v. The two
# flattenings of a conv kernel to a (out, rest) matrix differ only by a
# column permutation, which leaves singular values and the LEFT singular
# vector u unchanged, so torch's u is bit-valid for our power iteration.


def _sn_conv(params, spectral, sd, t_prefix, f_path, ndim=2, bias=False):
    w = _arr(sd[f"{t_prefix}.weight_orig"])
    # torch conv (O,I,k...) -> ours (k..., I, O)
    axes = tuple(range(2, 2 + ndim)) + (1, 0)
    _put(params, f_path + ["kernel"], w.transpose(axes))
    _put(spectral, f_path + ["u"], _arr(sd[f"{t_prefix}.weight_u"]))
    if bias:
        _put(params, f_path + ["bias"], _arr(sd[f"{t_prefix}.bias"]))


def _sn_dense(params, spectral, sd, t_prefix, f_path, bias=True):
    _put(params, f_path + ["kernel"], _arr(sd[f"{t_prefix}.weight_orig"]).T)
    _put(spectral, f_path + ["u"], _arr(sd[f"{t_prefix}.weight_u"]))
    if bias and f"{t_prefix}.bias" in sd:
        _put(params, f_path + ["bias"], _arr(sd[f"{t_prefix}.bias"]))


def _cond_logits_head(params, stats, spectral, sd, t_prefix, f_path):
    """D_GET_LOGITS (reference model.py:68-97): outlogits Sequential =
    [0] SN conv3x3 (no bias), [1] BN, [2] LeakyReLU, [3] SN conv k4 s4
    (with bias), [4] Sigmoid. Ours: conv / bn / out (logits, no sigmoid)."""
    _sn_conv(params, spectral, sd, f"{t_prefix}.outlogits.0", f_path + ["conv"])
    _bn(params, stats, sd, f"{t_prefix}.outlogits.1", f_path + ["bn"])
    _sn_conv(
        params, spectral, sd, f"{t_prefix}.outlogits.3", f_path + ["out"], bias=True
    )


def port_video_encoder_state_dict(sd: dict, prefix: str = "") -> dict:
    """torch VideoEncoder (reference model.py:151-210) -> variables for
    models/video_encoder.VideoEncoder.

    torch tree: story_encoder.0.{0,1,3,4} = R2Plus1dStem (SN conv / BN / SN
    conv / BN), story_encoder.{1+3i}/{2+3i} = body SN conv / BN for i in
    0..7, detector.{0,1,3} = SN linear / BN / SN linear. `prefix` selects a
    submodule (e.g. "seq_consisten_model.") inside a larger state_dict."""
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}
    p = prefix
    _sn_conv(params, spectral, sd, f"{p}story_encoder.0.0", ["stem0"], ndim=3)
    _bn(params, stats, sd, f"{p}story_encoder.0.1", ["stem0_bn"])
    _sn_conv(params, spectral, sd, f"{p}story_encoder.0.3", ["stem1"], ndim=3)
    _bn(params, stats, sd, f"{p}story_encoder.0.4", ["stem1_bn"])
    for i in range(8):
        _sn_conv(
            params, spectral, sd, f"{p}story_encoder.{1 + 3 * i}", [f"body{i}"], ndim=3
        )
        _bn(params, stats, sd, f"{p}story_encoder.{2 + 3 * i}", [f"body{i}_bn"])
    _sn_dense(params, spectral, sd, f"{p}detector.0", ["det0"])
    _bn(params, stats, sd, f"{p}detector.1", ["det_bn"])
    _sn_dense(params, spectral, sd, f"{p}detector.3", ["det1"])
    return {"params": params, "batch_stats": stats, "spectral": spectral}


def port_discriminator_state_dict(sd: dict, kind: str) -> dict:
    """torch STAGE1_D_{IMG,SEG,STY_V2} state_dict (reference
    model.py:487-618) -> {'params','batch_stats','spectral'} for
    models/discriminators.{Image,Seg,Story}Discriminator.

    kind: "image" | "seg" | "story". The image/seg encoder is a plain first
    conv + three SN convs with BN (torch Sequential indices 0 / 2,5,8 /
    3,6,9); the story encoder spectral-norms all four convs. The optional
    order-consistency VideoEncoder (cfg.USE_SEQ_CONSISTENCY) is ported when
    its keys are present."""
    if kind not in ("image", "seg", "story"):
        raise ValueError(f"kind must be image|seg|story, got {kind!r}")
    params: dict = {}
    stats: dict = {}
    spectral: dict = {}

    enc = ["encode_img"]
    if kind == "story":
        _sn_conv(params, spectral, sd, "encode_img.0", enc + ["c0"])
    else:
        _conv(params, sd, "encode_img.0.weight", enc + ["c0", "conv"])
    for i, t_idx in enumerate((2, 5, 8)):
        _sn_conv(params, spectral, sd, f"encode_img.{t_idx}", enc + [f"c{i + 1}"])
        _bn(params, stats, sd, f"encode_img.{t_idx + 1}", enc + [f"bn{i + 1}"])

    _cond_logits_head(params, stats, spectral, sd, "get_cond_logits", ["get_cond_logits"])

    if kind != "story" and "cate_classify.weight" in sd:
        _conv(params, sd, "cate_classify.weight", ["cate_classify", "conv"])
    if kind == "story" and "seq_consisten_model.story_encoder.0.0.weight_orig" in sd:
        sub = port_video_encoder_state_dict(sd, prefix="seq_consisten_model.")
        for coll, tree in (("params", params), ("batch_stats", stats), ("spectral", spectral)):
            _put(tree, ["seq_consisten_model"], sub[coll])
    return {"params": params, "batch_stats": stats, "spectral": spectral}


def port_discriminator_file(path: str, kind: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    return port_discriminator_state_dict(sd, kind)
