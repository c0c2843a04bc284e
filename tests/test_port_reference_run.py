"""End-to-end test of tools/port_reference_run.py: fabricate a reference
run dir (torch .pth checkpoints saved by replicas with the reference's
exact module wiring), import it with the CLI, and verify the resulting run
dir drives the REAL surfaces — CheckpointManager epoch walk, full-state
restore for --continue_ckpt, and numerical decode parity through a ported
netG snapshot.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cpcsv_tpu.config import config_from_file
from cpcsv_tpu.models.factory import build_models, generator_from_config
from cpcsv_tpu.train.checkpoint import CheckpointManager
from cpcsv_tpu.train.state import create_train_state
from tests.test_port_discriminators import TorchMiniD, converge_sn
from tests.test_port_torch import TorchMiniG

from tools.port_reference_run import main as port_main

CFG_YML = """\
CONFIG_NAME: port_test
DATASET_NAME: pororo
VIDEO_LEN: 3
LABEL_NUM: 3
TEXT:
  DIMENSION: 20
GAN:
  CONDITION_DIM: 8
  Z_DIM: 5
  DF_DIM: 16
  GF_DIM: 4
  GF_SEG_DIM: 16
SEGMENT_LEARNING: True
CASCADE_MODEL: False
"""


@pytest.fixture(scope="module")
def imported_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("port_ref_run")
    cfg_file = tmp / "mini.yml"
    cfg_file.write_text(CFG_YML)

    src = tmp / "ref_run" / "Model"
    src.mkdir(parents=True)
    torch.manual_seed(9)
    # factory hard-codes the reference's filter_num=3/filter_size=21/
    # image_size=124; the replica must match (tiny everywhere else)
    tg = TorchMiniG(
        cascade=False, ngf=32, ngf_seg=16, fn=3, fs=21, imsize_f=124,
        text=20, labels=3, cond=8, noise=5, t=3,
    ).eval()
    torch.save(tg.state_dict_ref_names(), src / "netG_epoch_1.pth")
    torch.save(tg.state_dict_ref_names(), src / "netG_epoch_3.pth")

    d_im = TorchMiniD(in_ch=3, sn_first=False, use_categories=True)
    d_st = TorchMiniD(in_ch=3, sn_first=True, use_categories=False)
    d_se = TorchMiniD(in_ch=1, sn_first=False, use_categories=True)
    for m in (d_im, d_st, d_se):
        converge_sn(m, iters=50)
        m.eval()
    torch.save(d_im.state_dict(), src / "netD_im_epoch_last.pth")
    torch.save(d_st.state_dict(), src / "netD_st_epoch_last.pth")
    torch.save(d_se.state_dict(), src / "netD_se_epoch_last.pth")

    out_dir = port_main(
        [
            "--cfg", str(cfg_file),
            "--src", str(tmp / "ref_run"),
            "--out", str(tmp / "imported"),
        ]
    )
    return {
        "cfg_file": str(cfg_file),
        "out_dir": out_dir,
        "torch_g": tg,
        "torch_d_im": d_im,
    }


def test_imported_run_walks_and_restores(imported_run):
    cfg = config_from_file(imported_run["cfg_file"])
    mgr = CheckpointManager(os.path.join(imported_run["out_dir"], "Model"))
    assert mgr.available_generator_epochs() == [1, 3]
    # auto-resume point: highest ported epoch is the completed one
    assert mgr.last_epoch() == 3

    models = build_models(cfg)
    template = create_train_state(cfg, jax.random.PRNGKey(1), models)
    state = mgr.restore(template)

    # the ported image-D SN conv kernel must be torch's weight_orig (O,I,kh,kw)
    # transposed to (kh,kw,I,O), and its u buffer must ride along
    t_sd = imported_run["torch_d_im"].state_dict()
    np.testing.assert_allclose(
        np.asarray(state.d_im.params["encode_img"]["c1"]["kernel"]),
        t_sd["encode_img.2.weight_orig"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.d_im.spectral["encode_img"]["c1"]["u"]),
        t_sd["encode_img.2.weight_u"].numpy(),
        rtol=1e-6,
    )
    # fresh Adam: first moments must be zero
    mu_leaves = jax.tree.leaves(state.d_im.opt_state.mu)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in mu_leaves)


def test_imported_generator_decodes_like_torch(imported_run):
    cfg = config_from_file(imported_run["cfg_file"])
    models = build_models(cfg)
    template = create_train_state(cfg, jax.random.PRNGKey(1), models)
    mgr = CheckpointManager(os.path.join(imported_run["out_dir"], "Model"))
    g_vars = mgr.restore_generator(template.gen.variables(), 3)

    gen = generator_from_config(cfg)
    ninput = (cfg.TEXT.DIMENSION + cfg.LABEL_NUM) + cfg.GAN.CONDITION_DIM + 124
    rng = np.random.default_rng(2)
    zmc = rng.standard_normal((4, ninput)).astype(np.float32)

    with torch.no_grad():
        t_img, t_mask = imported_run["torch_g"].decode(torch.tensor(zmc))

    with jax.default_matmul_precision("highest"):
        frames, _, mask = gen.apply(g_vars, jnp.asarray(zmc), False, method="_decode")
    np.testing.assert_allclose(
        np.asarray(frames).transpose(0, 3, 1, 2), t_img.numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(mask).transpose(0, 3, 1, 2), t_mask.numpy(), rtol=2e-3, atol=2e-3
    )


def test_imported_run_drives_eval_walk(imported_run):
    """The reference user's first post-import action: `--eval_fid` walks the
    ported epochs and writes fid_score2.csv (reference inference.py:201-230)."""
    from cpcsv_tpu.data.loader import DataLoader
    from cpcsv_tpu.data.synthetic import SyntheticStoryDataset
    from cpcsv_tpu.evaluation.drivers import Infer

    cfg = config_from_file(imported_run["cfg_file"])
    test = SyntheticStoryDataset(
        8, cfg.VIDEO_LEN, cfg.IMSIZE, cfg.TEXT.DIMENSION, cfg.LABEL_NUM, seed=5
    )
    testloader = DataLoader(test, 4, drop_last=True)
    infer = Infer(cfg, imported_run["out_dir"])
    results = infer.eval_fid2(testloader, epochs=[3, 1], batch_size=4)
    assert [r["epoch"] for r in results] == [3, 1]
    assert all(np.isfinite(r["fid"]) and np.isfinite(r["vfid"]) for r in results)
    assert os.path.exists(os.path.join(infer.eval_dir, "fid_score2.csv"))


def test_import_accepts_reference_zip(imported_run, tmp_path):
    """The reference distributes its pretrained run as final_model.zip
    (reference README.md:73-87) — the importer must take it directly."""
    import shutil

    src_run = os.path.join(os.path.dirname(imported_run["out_dir"]), "ref_run")
    zip_path = shutil.make_archive(
        str(tmp_path / "final_model"), "zip",
        root_dir=os.path.dirname(src_run), base_dir="ref_run",
    )
    out = port_main(
        [
            "--cfg", imported_run["cfg_file"],
            "--src", zip_path,
            "--out", str(tmp_path / "from_zip"),
        ]
    )
    mgr = CheckpointManager(os.path.join(out, "Model"))
    assert mgr.available_generator_epochs() == [1, 3]
    assert mgr.last_epoch() == 3


def test_import_without_discriminators_writes_no_resume_marker(imported_run, tmp_path):
    """A netG-only import (published runs often ship no D checkpoints) must
    NOT arm auto-resume: without a full train state, a last_epoch marker
    would make `--continue_ckpt auto` crash instead of starting fresh."""
    import shutil

    src_run = os.path.join(os.path.dirname(imported_run["out_dir"]), "ref_run", "Model")
    g_only = tmp_path / "g_only"
    g_only.mkdir()
    for f in os.listdir(src_run):
        if f.startswith("netG_epoch_"):
            shutil.copy(os.path.join(src_run, f), g_only / f)
    out = port_main(
        [
            "--cfg", imported_run["cfg_file"],
            "--src", str(g_only),
            "--out", str(tmp_path / "g_only_out"),
        ]
    )
    model_dir = os.path.join(out, "Model")
    assert not os.path.exists(os.path.join(model_dir, "last_epoch.txt"))
    assert not os.path.exists(os.path.join(model_dir, "train_state_last"))
    mgr = CheckpointManager(model_dir)
    assert mgr.last_epoch() is None
    assert mgr.available_generator_epochs() == [1, 3]


def test_import_rejects_config_mismatch(imported_run, tmp_path):
    """Wrong CASCADE_MODEL against a non-cascade checkpoint must fail loudly,
    not produce a silently-wrong import."""
    bad_cfg = tmp_path / "bad.yml"
    bad_cfg.write_text(CFG_YML.replace("CASCADE_MODEL: False", "CASCADE_MODEL: True"))
    src = os.path.join(
        os.path.dirname(imported_run["out_dir"]), "ref_run", "Model"
    )
    with pytest.raises(KeyError):
        port_main(
            [
                "--cfg", str(bad_cfg),
                "--src", src,
                "--out", str(tmp_path / "bad_out"),
            ]
        )


def test_imported_run_setting_yml_pins_reference_semantics(imported_run):
    """The porter writes setting.yml with TORCH_REPEAT_QUIRK: true (the
    content tiling the reference's checkpoints were trained with, reference
    model.py:361) and every parity-relevant key of the source cfg must
    round-trip through it — `--cfg {run}/setting.yml` is the documented way
    to walk an imported run."""
    import yaml

    setting = os.path.join(imported_run["out_dir"], "setting.yml")
    assert os.path.exists(setting)
    cfg = config_from_file(setting)
    assert cfg.TORCH_REPEAT_QUIRK is True
    # the quirk must actually reach the model the factory builds
    assert generator_from_config(cfg).torch_repeat_quirk is True

    src_cfg = config_from_file(imported_run["cfg_file"])
    for key in (
        "CONFIG_NAME", "DATASET_NAME", "VIDEO_LEN", "LABEL_NUM",
        "SEGMENT_LEARNING", "CASCADE_MODEL", "USE_SEQ_CONSISTENCY",
        "IMSIZE", "SESIZE",
    ):
        assert getattr(cfg, key) == getattr(src_cfg, key), key
    assert cfg.TEXT == src_cfg.TEXT
    assert cfg.GAN == src_cfg.GAN
    # raw YAML sanity: safe_load of what we dumped must merge cleanly
    with open(setting) as f:
        raw = yaml.safe_load(f)
    assert raw["TORCH_REPEAT_QUIRK"] is True


def test_import_respects_explicit_quirk_key(imported_run, tmp_path):
    """An explicit TORCH_REPEAT_QUIRK in the source cfg wins over the
    porter's reference-parity default."""
    cfg_file = tmp_path / "explicit.yml"
    cfg_file.write_text(CFG_YML + "TORCH_REPEAT_QUIRK: False\n")
    src = os.path.join(
        os.path.dirname(imported_run["out_dir"]), "ref_run", "Model"
    )
    out = port_main(
        [
            "--cfg", str(cfg_file),
            "--src", src,
            "--out", str(tmp_path / "explicit_out"),
        ]
    )
    cfg = config_from_file(os.path.join(out, "setting.yml"))
    assert cfg.TORCH_REPEAT_QUIRK is False
