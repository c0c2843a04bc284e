"""Port reference PyTorch checkpoints (netG_epoch_*.pth state_dicts) into
this framework's generator variables.

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
