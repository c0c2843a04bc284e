"""Standalone (non-pytest) invocation of the porter/exporter CLIs.

The suite's conftest pins the CPU backend before anything runs, so the
tools' own CPU-forcing (a dead TPU tunnel hangs backend init forever —
CLAUDE.md pitfall; the site hook pre-imports jax with JAX_PLATFORMS=axon)
is only exercised in a FRESH interpreter. Fabricate a tiny reference run
in-process, then run port -> export in a subprocess and assert the tools
chose the CPU backend themselves and completed the round trip.
"""

import os
import subprocess
import sys

import torch

from tests.test_port_discriminators import TorchMiniD, converge_sn
from tests.test_port_reference_run import CFG_YML
from tests.test_port_torch import TorchMiniG


def test_port_export_standalone_forces_cpu(tmp_path):
    cfg_file = tmp_path / "mini.yml"
    cfg_file.write_text(CFG_YML)
    src = tmp_path / "ref_run" / "Model"
    src.mkdir(parents=True)
    torch.manual_seed(9)
    tg = TorchMiniG(cascade=False, ngf=32, ngf_seg=16, fn=3, fs=21,
                    imsize_f=124, text=20, labels=3, cond=8, noise=5, t=3)
    tg.eval()
    torch.save(tg.state_dict_ref_names(), src / "netG_epoch_1.pth")
    d_im = TorchMiniD(in_ch=3, sn_first=False, use_categories=True)
    d_st = TorchMiniD(in_ch=3, sn_first=True, use_categories=False)
    d_se = TorchMiniD(in_ch=1, sn_first=False, use_categories=True)
    for m in (d_im, d_st, d_se):
        converge_sn(m, iters=50)
        m.eval()
    torch.save(d_im.state_dict(), src / "netD_im_epoch_last.pth")
    torch.save(d_st.state_dict(), src / "netD_st_epoch_last.pth")
    torch.save(d_se.state_dict(), src / "netD_se_epoch_last.pth")

    prog = (
        "import sys, jax\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from tools.port_reference_run import main as port_main\n"
        "from tools.export_reference_run import main as export_main\n"
        f"out = port_main(['--cfg', {str(cfg_file)!r}, '--src', {str(tmp_path / 'ref_run')!r}, '--out', {str(tmp_path / 'imported')!r}])\n"
        "assert jax.devices()[0].platform == 'cpu', jax.devices()\n"
        f"export_main(['--cfg', {str(cfg_file)!r}, '--run', out, '--out', {str(tmp_path / 'export')!r}])\n"
        "print('PLATFORM_OK')\n"
    )
    # fresh interpreter: no conftest, site hook active (JAX_PLATFORMS=axon
    # where the tunnel exists) — the tools must pick CPU themselves
    res = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                         text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PLATFORM_OK" in res.stdout
    assert (tmp_path / "export" / "netG_epoch_1.pth").exists()
