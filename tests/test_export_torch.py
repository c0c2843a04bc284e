"""Round-trip identity for the torch exporter (utils/export_torch.py):
port a reference-wired replica's state_dict, export it back, and require
the original bits (transposes only — exact equality except the
reconstructed spectral-norm `weight_v`, which equals torch's own next
power-iteration output). Strict `load_state_dict` into fresh torch modules
pins key-completeness against real torch spectral_norm/BN state, and the
whole-run tool chain (reference run -> port_reference_run ->
export_reference_run) is driven end-to-end through the Orbax layout.
"""

import os

import numpy as np
import pytest
import torch

from cpcsv_tpu.utils.export_torch import (
    export_discriminator_variables,
    export_generator_variables,
    export_video_encoder_variables,
    save_torch_state_dict,
)
from cpcsv_tpu.utils.port_torch import (
    port_discriminator_state_dict,
    port_generator_state_dict,
    port_video_encoder_state_dict,
)
from tests.test_port_discriminators import (
    TorchMiniD,
    TorchMiniVideoEncoder,
    converge_sn,
)
from tests.test_port_torch import NINPUT, TorchMiniG


def _assert_roundtrip(original_sd: dict, exported: dict, v_atol=0.0):
    original = {k: np.asarray(v) for k, v in original_sd.items()}
    assert set(exported) == set(original), (
        f"key mismatch: missing={sorted(set(original) - set(exported))[:5]} "
        f"extra={sorted(set(exported) - set(original))[:5]}"
    )
    for k, v in exported.items():
        if k.endswith("num_batches_tracked"):
            continue  # exporter emits a fresh 0 (inert under momentum=0.1)
        if k.endswith("weight_v"):
            # torch's STORED v is one power iteration behind our v-from-u
            # (normalize(W^T u_prev) vs normalize(W^T u_final)); at test-time
            # convergence (300 iters) they agree to ~1e-4 elementwise, and the
            # forward-parity checks below pin the functional quantity (sigma)
            np.testing.assert_allclose(v, original[k], rtol=0, atol=max(v_atol, 1e-6))
        else:
            np.testing.assert_array_equal(v, original[k], err_msg=k)


@pytest.mark.parametrize("cascade", [False, True])
def test_generator_roundtrip_and_strict_load(cascade, tmp_path):
    torch.manual_seed(11)
    tm = TorchMiniG(cascade).eval()
    sd = tm.state_dict_ref_names()
    variables = port_generator_state_dict(sd, use_segment=True, cascade=cascade)
    exported = export_generator_variables(variables, use_segment=True, cascade=cascade)
    _assert_roundtrip(sd, exported)

    # the .pth must strict-load into the reference wiring and decode identically
    path = str(tmp_path / "netG_epoch_0.pth")
    save_torch_state_dict(exported, path)
    loaded = {
        k.replace("ca_net.fc", "ca_net_fc"): v
        for k, v in torch.load(path, map_location="cpu").items()
    }
    tm2 = TorchMiniG(cascade)
    tm2.load_state_dict(loaded, strict=True)
    tm2.eval()
    zmc = torch.tensor(
        np.random.default_rng(3).standard_normal((4, NINPUT)).astype(np.float32)
    )
    with torch.no_grad():
        img_a, mask_a = tm.decode(zmc)
        img_b, mask_b = tm2.decode(zmc)
    np.testing.assert_array_equal(img_a.numpy(), img_b.numpy())
    np.testing.assert_array_equal(mask_a.numpy(), mask_b.numpy())


@pytest.mark.parametrize(
    "kind,kwargs",
    [
        ("image", dict(in_ch=3, sn_first=False, use_categories=True)),
        ("seg", dict(in_ch=1, sn_first=False, use_categories=True)),
        ("story", dict(in_ch=3, sn_first=True, use_categories=False, seq=True)),
    ],
)
def test_discriminator_roundtrip_and_strict_load(kind, kwargs, tmp_path):
    torch.manual_seed(13)
    tm = TorchMiniD(**kwargs)
    converge_sn(tm, iters=300)
    tm.eval()
    sd = tm.state_dict()
    variables = port_discriminator_state_dict(sd, kind)
    exported = export_discriminator_variables(variables, kind)
    _assert_roundtrip(sd, exported, v_atol=2e-4)

    path = str(tmp_path / f"netD_{kind}.pth")
    save_torch_state_dict(exported, path)
    tm2 = TorchMiniD(**kwargs)
    tm2.load_state_dict(torch.load(path, map_location="cpu"), strict=True)


def test_video_encoder_roundtrip():
    torch.manual_seed(14)
    tm = TorchMiniVideoEncoder()
    converge_sn(tm, iters=300)
    tm.eval()
    sd = tm.state_dict()
    variables = port_video_encoder_state_dict(sd)
    exported = export_video_encoder_variables(variables)
    _assert_roundtrip(sd, exported, v_atol=2e-4)

    # functional parity: the exported SN triple must drive torch's forward to
    # the original outputs (pins sigma, which the v tolerance alone does not)
    tm2 = TorchMiniVideoEncoder()
    tm2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=True,
    )
    tm2.eval()
    x = torch.tensor(
        np.random.default_rng(6).standard_normal((2, 3, 3, 64, 64)).astype(np.float32)
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            tm2(x).numpy(), tm(x).numpy(), rtol=1e-4, atol=1e-5
        )


def test_export_reference_run_inverts_import(tmp_path):
    """reference run -> port_reference_run (Orbax run dir) ->
    export_reference_run -> the ORIGINAL torch state_dicts, bit-for-bit."""
    from tests.test_port_reference_run import CFG_YML
    from tools.export_reference_run import main as export_main
    from tools.port_reference_run import main as port_main

    cfg_file = tmp_path / "mini.yml"
    cfg_file.write_text(CFG_YML)
    src = tmp_path / "ref_run" / "Model"
    src.mkdir(parents=True)

    torch.manual_seed(15)
    tg = TorchMiniG(
        cascade=False, ngf=32, ngf_seg=16, fn=3, fs=21, imsize_f=124,
        text=20, labels=3, cond=8, noise=5, t=3,
    ).eval()
    torch.save(tg.state_dict_ref_names(), src / "netG_epoch_2.pth")
    ds = {
        "netD_im_epoch_last.pth": TorchMiniD(in_ch=3, sn_first=False, use_categories=True),
        "netD_st_epoch_last.pth": TorchMiniD(in_ch=3, sn_first=True, use_categories=False),
        "netD_se_epoch_last.pth": TorchMiniD(in_ch=1, sn_first=False, use_categories=True),
    }
    for fname, m in ds.items():
        converge_sn(m, iters=300)
        m.eval()
        torch.save(m.state_dict(), src / fname)

    run_dir = port_main(
        ["--cfg", str(cfg_file), "--src", str(tmp_path / "ref_run"),
         "--out", str(tmp_path / "imported")]
    )
    out_dir = export_main(
        ["--cfg", str(cfg_file), "--run", run_dir, "--out", str(tmp_path / "exported")]
    )

    back_g = torch.load(os.path.join(out_dir, "netG_epoch_2.pth"), map_location="cpu")
    _assert_roundtrip(tg.state_dict_ref_names(), {k: v.numpy() for k, v in back_g.items()})
    for fname, m in ds.items():
        back = torch.load(os.path.join(out_dir, fname), map_location="cpu")
        _assert_roundtrip(
            m.state_dict(), {k: v.numpy() for k, v in back.items()}, v_atol=2e-4
        )

    # edge: a pruned run dir (netG snapshots gone, train state kept) must
    # still export the state's generator under the reference naming, and the
    # tool must accept the Model/ subdir directly
    import shutil

    pruned = tmp_path / "pruned" / "Model"
    shutil.copytree(os.path.join(run_dir, "Model"), pruned)
    for name in os.listdir(pruned):
        if name.startswith("netG_epoch_"):
            shutil.rmtree(pruned / name)
    out2 = export_main(
        ["--cfg", str(cfg_file), "--run", str(pruned),
         "--out", str(tmp_path / "exported2")]
    )
    # importer labeled completed=2 (highest ported epoch)
    back_g2 = torch.load(os.path.join(out2, "netG_epoch_2.pth"), map_location="cpu")
    _assert_roundtrip(
        tg.state_dict_ref_names(), {k: v.numpy() for k, v in back_g2.items()}
    )
    assert os.path.exists(os.path.join(out2, "netD_st_epoch_last.pth"))
