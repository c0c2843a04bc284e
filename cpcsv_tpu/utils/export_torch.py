"""Export this framework's variables BACK to reference PyTorch state_dicts
— the exact inverse of utils/port_torch.py.

Why: the reference's published evaluation protocol runs on pretrained
torch/TF backbones (fid/fid_score.py:48-56 pt_inception, fid/vfid_score.py
Kinetics R(2+1)D, fvd/frechet_video_distance.py:65 TF-Hub I3D). Exporting a
cpcsv_tpu-trained generator as `netG_epoch_E.pth` lets a user score it with
the reference's own unmodified metric stack (inference.py:201-230), or
continue training it in the reference trainer (`--continue_ckpt` there
loads all four nets, trainer.py:121-131) — the migration story works in
both directions.

Mappings are the porter's inverted (see port_torch.py for the forward
rules): dense kernels transpose back, conv kernels (k..., I, O) ->
(O, I, k...), GRU stacks keep torch's [r|z|n] gate order, BN pairs map to
weight/bias/running_mean/running_var (+ a fresh ``num_batches_tracked=0``,
which torch only consults under ``momentum=None`` — the reference uses the
default 0.1, so the value is inert). torch ``spectral_norm`` state is
reconstructed as weight_orig = kernel, weight_u = our spectral u, and
weight_v = normalize(W_mat^T u) — exactly the v torch's next power
iteration would produce, so the exported triple is self-consistent.

Round-trip identity (port -> export == original, and strict
``load_state_dict`` + forward parity) is pinned by tests/test_export_torch.py.
tools/export_reference_run.py wraps these into a one-command run exporter.
"""

from __future__ import annotations

import numpy as np

def _np(leaf) -> np.ndarray:
    return np.asarray(leaf)


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _unconv(kernel: np.ndarray, ndim: int = 2) -> np.ndarray:
    # ours (k..., I, O) -> torch (O, I, k...)
    axes = (ndim + 1, ndim) + tuple(range(ndim))
    return _np(kernel).transpose(axes)


def _x_bn(out, params, stats, f_path, t_prefix):
    node_p = _get(params, f_path)
    node_s = _get(stats, f_path)
    out[f"{t_prefix}.weight"] = _np(node_p["scale"])
    out[f"{t_prefix}.bias"] = _np(node_p["bias"])
    out[f"{t_prefix}.running_mean"] = _np(node_s["mean"])
    out[f"{t_prefix}.running_var"] = _np(node_s["var"])
    out[f"{t_prefix}.num_batches_tracked"] = np.array(0, dtype=np.int64)


def _x_dense(out, params, stats, f_path, t_prefix, has_bn=True):
    node = _get(params, f_path + ["dense"])
    out[f"{t_prefix}.0.weight"] = _np(node["kernel"]).T
    if "bias" in node:
        out[f"{t_prefix}.0.bias"] = _np(node["bias"])
    if has_bn:
        _x_bn(out, params, stats, f_path + ["bn"], f"{t_prefix}.1")


def _x_conv(out, params, f_path, t_key):
    out[t_key] = _unconv(_get(params, f_path)["kernel"])


def _x_gru(out, params, f_path, t_prefix):
    node = _get(params, f_path)
    out[f"{t_prefix}.weight_ih"] = _np(node["w_ih"]).T
    out[f"{t_prefix}.weight_hh"] = _np(node["w_hh"]).T
    out[f"{t_prefix}.bias_ih"] = _np(node["b_ih"])
    out[f"{t_prefix}.bias_hh"] = _np(node["b_hh"])


def export_generator_variables(
    variables: dict, use_segment: bool = True, cascade: bool = False
) -> dict:
    """StoryGenerator {'params','batch_stats'} -> torch StoryGAN state_dict
    (numpy leaves; `save_torch_state_dict` wraps them into tensors)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict = {}

    ca = _get(params, ["ca_net", "fc"])
    out["ca_net.fc.weight"] = _np(ca["kernel"]).T
    out["ca_net.fc.bias"] = _np(ca["bias"])

    _x_dense(out, params, stats, ["filter_net"], "filter_net")
    _x_dense(out, params, stats, ["image_net"], "image_net")
    _x_dense(out, params, stats, ["fc"], "fc")
    _x_dense(out, params, stats, ["m_net"], "m_net")
    _x_dense(out, params, stats, ["c_net"], "c_net")
    _x_gru(out, params, ["recurrent"], "recurrent")
    _x_gru(out, params, ["mocornn"], "mocornn")

    for i in (1, 2, 3, 4):
        _x_conv(out, params, [f"upsample{i}", "conv"], f"upsample{i}.1.weight")
        _x_bn(out, params, stats, [f"upsample{i}", "bn"], f"upsample{i}.2")
    out["img.0.weight"] = _unconv(_get(params, ["img"])["kernel"])

    if use_segment:
        _x_dense(out, params, stats, ["fc_seg"], "fc_seg")
        for i in (1, 2, 3, 4):
            _x_conv(
                out, params, [f"upsample{i}_seg", "conv"], f"upsample{i}_seg.1.weight"
            )
            _x_bn(out, params, stats, [f"upsample{i}_seg", "bn"], f"upsample{i}_seg.2")
        out["img_seg.0.weight"] = _unconv(_get(params, ["img_seg"])["kernel"])
        out["seg_c.weight"] = _unconv(_get(params, ["seg_c"])["kernel"])
        out["seg_c1.weight"] = _unconv(_get(params, ["seg_c1"])["kernel"])
        if cascade:
            out["presample.0.weight"] = _unconv(
                _get(params, ["presample_conv"])["kernel"]
            )
            _x_bn(out, params, stats, ["presample_bn"], "presample.1")
            for i in (1, 2, 3, 4):
                node = _get(params, [f"downsample{i}_seg", "conv"])
                out[f"downsample{i}_seg.0.weight"] = _unconv(node["kernel"])
                out[f"downsample{i}_seg.0.bias"] = _np(node["bias"])
                _x_bn(
                    out, params, stats,
                    [f"downsample{i}_seg", "bn"], f"downsample{i}_seg.1",
                )

    return out


# ---------------------------------------------------------------------------
# Discriminators / VideoEncoder (torch spectral_norm reconstruction)
# ---------------------------------------------------------------------------


def _sn_v_from_u(w_orig: np.ndarray, u: np.ndarray) -> np.ndarray:
    """torch's next power-iteration v: normalize(W_mat^T u, eps=1e-12) with
    W_mat = weight_orig.view(out, -1)."""
    w_mat = w_orig.reshape(w_orig.shape[0], -1).astype(np.float64)
    v = w_mat.T @ u.astype(np.float64)
    v = v / max(float(np.linalg.norm(v)), 1e-12)
    return v.astype(np.float32)


def _x_sn_conv(out, params, spectral, f_path, t_prefix, ndim=2):
    node = _get(params, f_path)
    w = _unconv(node["kernel"], ndim=ndim)
    u = _np(_get(spectral, f_path)["u"])
    out[f"{t_prefix}.weight_orig"] = w
    out[f"{t_prefix}.weight_u"] = u
    out[f"{t_prefix}.weight_v"] = _sn_v_from_u(w, u)
    if "bias" in node:
        out[f"{t_prefix}.bias"] = _np(node["bias"])


def _x_sn_dense(out, params, spectral, f_path, t_prefix):
    node = _get(params, f_path)
    w = _np(node["kernel"]).T
    u = _np(_get(spectral, f_path)["u"])
    out[f"{t_prefix}.weight_orig"] = w
    out[f"{t_prefix}.weight_u"] = u
    out[f"{t_prefix}.weight_v"] = _sn_v_from_u(w, u)
    if "bias" in node:
        out[f"{t_prefix}.bias"] = _np(node["bias"])


def export_video_encoder_variables(variables: dict, prefix: str = "") -> dict:
    """VideoEncoder variables -> torch VideoEncoder state_dict (reference
    model.py:151-210); `prefix` nests it (e.g. "seq_consisten_model.")."""
    params, stats = variables["params"], variables["batch_stats"]
    spectral = variables["spectral"]
    out: dict = {}
    p = prefix
    _x_sn_conv(out, params, spectral, ["stem0"], f"{p}story_encoder.0.0", ndim=3)
    _x_bn(out, params, stats, ["stem0_bn"], f"{p}story_encoder.0.1")
    _x_sn_conv(out, params, spectral, ["stem1"], f"{p}story_encoder.0.3", ndim=3)
    _x_bn(out, params, stats, ["stem1_bn"], f"{p}story_encoder.0.4")
    for i in range(8):
        _x_sn_conv(
            out, params, spectral, [f"body{i}"], f"{p}story_encoder.{1 + 3 * i}",
            ndim=3,
        )
        _x_bn(out, params, stats, [f"body{i}_bn"], f"{p}story_encoder.{2 + 3 * i}")
    _x_sn_dense(out, params, spectral, ["det0"], f"{p}detector.0")
    _x_bn(out, params, stats, ["det_bn"], f"{p}detector.1")
    _x_sn_dense(out, params, spectral, ["det1"], f"{p}detector.3")
    return out


def export_discriminator_variables(variables: dict, kind: str) -> dict:
    """{Image,Seg,Story}Discriminator variables -> torch STAGE1_D_* state_dict
    (reference model.py:487-618). kind: "image" | "seg" | "story"."""
    if kind not in ("image", "seg", "story"):
        raise ValueError(f"kind must be image|seg|story, got {kind!r}")
    params, stats = variables["params"], variables["batch_stats"]
    spectral = variables["spectral"]
    out: dict = {}

    enc = ["encode_img"]
    if kind == "story":
        _x_sn_conv(out, params, spectral, enc + ["c0"], "encode_img.0")
    else:
        _x_conv(out, params, enc + ["c0", "conv"], "encode_img.0.weight")
    for i, t_idx in enumerate((2, 5, 8)):
        _x_sn_conv(out, params, spectral, enc + [f"c{i + 1}"], f"encode_img.{t_idx}")
        _x_bn(out, params, stats, enc + [f"bn{i + 1}"], f"encode_img.{t_idx + 1}")

    head = ["get_cond_logits"]
    _x_sn_conv(out, params, spectral, head + ["conv"], "get_cond_logits.outlogits.0")
    _x_bn(out, params, stats, head + ["bn"], "get_cond_logits.outlogits.1")
    _x_sn_conv(out, params, spectral, head + ["out"], "get_cond_logits.outlogits.3")

    if kind != "story" and "cate_classify" in params:
        _x_conv(out, params, ["cate_classify", "conv"], "cate_classify.weight")
    if kind == "story" and "seq_consisten_model" in params:
        sub = {
            "params": params["seq_consisten_model"],
            "batch_stats": stats["seq_consisten_model"],
            "spectral": spectral["seq_consisten_model"],
        }
        out.update(export_video_encoder_variables(sub, prefix="seq_consisten_model."))
    return out


def save_torch_state_dict(sd: dict, path: str) -> None:
    """numpy-leaf state_dict -> torch.save'd tensor state_dict the reference
    loads directly (torch.load + load_state_dict)."""
    import torch

    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path
    )
