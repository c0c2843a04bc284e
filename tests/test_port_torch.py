"""Weight-porting parity: build a small torch model with the REFERENCE's
exact wiring (model.py:242-311 non-cascade / cascade_model.py downsample
branch), port its state_dict with port_generator_state_dict, and compare
the noise-free sub-paths (CA-Net encode, DFN fusion, full trunk decode)
at fp32. This pins down concat order, reshape order, gating and BN porting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from cpcsv_tpu.models.generator import StoryGenerator
from cpcsv_tpu.utils.port_torch import port_generator_state_dict

# tiny dims
TEXT, LABELS, COND, NOISE, IMSIZE_F, FN, FS = 20, 3, 8, 5, 12, 3, 5
MOTION = TEXT + LABELS  # 23
NINPUT = MOTION + COND + IMSIZE_F  # 43
NGF, NGF_SEG, T = 32, 16, 3


def conv3x3(i, o):
    return nn.Conv2d(i, o, 3, 1, 1, bias=False)


def up_block(i, o):
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="nearest"),
        conv3x3(i, o),
        nn.BatchNorm2d(o),
        nn.ReLU(True),
    )


def down_block(i, o):
    return nn.Sequential(
        nn.Conv2d(i, o, 3, 2, 1), nn.BatchNorm2d(o), nn.ReLU(True)
    )


class TorchMiniG(nn.Module):
    """Reference StoryGAN wiring at mini scale (cascade variant includes the
    mask re-encoder). Dims are overridable so tests can build replicas that
    match a config-built StoryGenerator (the factory hard-codes the
    reference's filter_num=3 / filter_size=21 / image_size=124)."""

    def __init__(
        self,
        cascade=False,
        ngf=NGF,
        ngf_seg=NGF_SEG,
        fn=FN,
        fs=FS,
        imsize_f=IMSIZE_F,
        text=TEXT,
        labels=LABELS,
        cond=COND,
        noise=NOISE,
        t=T,
    ):
        super().__init__()
        self.cascade = cascade
        self.ngf, self.ngf_seg = ngf, ngf_seg
        self.fn, self.fs, self.imsize_f = fn, fs, imsize_f
        motion = text + labels
        ninput = motion + cond + imsize_f
        self.ca_net_fc = nn.Linear(text * t, cond * 2)
        self.filter_net = nn.Sequential(
            nn.Linear(cond, fs * fn), nn.BatchNorm1d(fs * fn)
        )
        self.image_net = nn.Sequential(
            nn.Linear(motion, imsize_f * fn), nn.BatchNorm1d(imsize_f * fn), nn.Tanh()
        )
        self.fc = nn.Sequential(
            nn.Linear(ninput, ngf * 16, bias=False),
            nn.BatchNorm1d(ngf * 16),
            nn.ReLU(True),
        )
        self.upsample1 = up_block(ngf, ngf // 2)
        self.upsample2 = up_block(ngf // 2, ngf // 4)
        self.upsample3 = up_block(ngf // 4, ngf // 8)
        self.upsample4 = up_block(ngf // 8, ngf // 16)
        self.img = nn.Sequential(conv3x3(ngf // 16, 3), nn.Tanh())
        self.seg_c = conv3x3(ngf_seg, ngf)
        self.seg_c1 = conv3x3(ngf_seg // 2, ngf // 2)
        self.fc_seg = nn.Sequential(
            nn.Linear(ninput, ngf_seg * 16, bias=False),
            nn.BatchNorm1d(ngf_seg * 16),
            nn.ReLU(True),
        )
        self.upsample1_seg = up_block(ngf_seg, ngf_seg // 2)
        self.upsample2_seg = up_block(ngf_seg // 2, ngf_seg // 4)
        self.upsample3_seg = up_block(ngf_seg // 4, ngf_seg // 8)
        self.upsample4_seg = up_block(ngf_seg // 8, ngf_seg // 16)
        self.img_seg = nn.Sequential(conv3x3(ngf_seg // 16, 1), nn.Tanh())
        self.m_net = nn.Sequential(nn.Linear(motion, motion), nn.BatchNorm1d(motion))
        self.c_net = nn.Sequential(nn.Linear(cond, cond), nn.BatchNorm1d(cond))
        self.recurrent = nn.GRUCell(noise + motion, motion)
        self.mocornn = nn.GRUCell(motion, cond)
        if cascade:
            self.presample = nn.Sequential(
                conv3x3(1, ngf_seg // 16), nn.BatchNorm2d(ngf_seg // 16), nn.ReLU()
            )
            self.downsample1_seg = down_block(ngf_seg // 16, ngf_seg // 8)
            self.downsample2_seg = down_block(ngf_seg // 8, ngf_seg // 4)
            self.downsample3_seg = down_block(ngf_seg // 4, ngf_seg // 2)
            self.downsample4_seg = down_block(ngf_seg // 2, ngf_seg)

    def state_dict_ref_names(self):
        sd = self.state_dict()
        return {k.replace("ca_net_fc", "ca_net.fc"): v for k, v in sd.items()}

    def decode(self, zmc_all):
        """reference sample_videos trunk, v1 gating (model.py:379-407)."""
        NGF, NGF_SEG = self.ngf, self.ngf_seg
        zmc_img = self.fc(zmc_all).view(-1, NGF, 4, 4)
        zmc_seg = self.fc_seg(zmc_all).view(-1, NGF_SEG, 4, 4)
        if self.cascade:
            h1 = self.upsample1_seg(zmc_seg)
            h2 = self.upsample2_seg(h1)
            h3 = self.upsample3_seg(h2)
            h4 = self.upsample4_seg(h3)
            mask = self.img_seg(h4)
            z = self.presample(mask)
            g4 = self.downsample1_seg(z)
            g3 = self.downsample2_seg(g4)
            g2 = self.downsample3_seg(g3)
            g1 = self.downsample4_seg(g2)
            zmc_img = self.seg_c(g1) * zmc_img + zmc_img
            h_img = self.upsample1(zmc_img)
            h_img = self.seg_c1(g2) * h_img + h_img
            h_img = self.upsample2(h_img)
            h_img = self.upsample3(h_img)
            h_img = self.upsample4(h_img)
            return self.img(h_img), mask
        zmc_img = self.seg_c(zmc_seg) * zmc_img + zmc_img
        h_seg = self.upsample1_seg(zmc_seg)
        h_img = self.upsample1(zmc_img)
        h_img = self.seg_c1(h_seg) * h_img + h_img
        h_seg = self.upsample2_seg(h_seg)
        h_img = self.upsample2(h_img)
        h_seg = self.upsample3_seg(h_seg)
        h_img = self.upsample3(h_img)
        h_seg = self.upsample4_seg(h_seg)
        h_img = self.upsample4(h_img)
        return self.img(h_img), self.img_seg(h_seg)

    def dfn(self, m_flat, crnn_code):
        """reference model.py:373-377."""
        import torch.nn.functional as F

        m_image = self.image_net(m_flat).view(-1, self.fn, self.imsize_f)
        c_filter = self.filter_net(crnn_code).view(-1, 1, self.fn, self.fs)
        outs = []
        img = m_image.unsqueeze(0)
        for i in range(img.shape[1]):
            outs.append(F.conv1d(img[:, i], c_filter[i], padding=self.fs // 2))
        return torch.cat(outs, 0).squeeze(1)

    # ---- full reference forward paths with injectable noise ----
    def ref_mocornn(self, motion, content):
        """reference model.py:336-346 context GRU unroll."""
        if motion.dim() == 2:
            motion = motion.unsqueeze(1)
        h = self.c_net(content)
        hs = []
        for t in range(motion.shape[1]):
            h = self.mocornn(motion[:, t], h)
            hs.append(h)
        return torch.stack(hs, dim=1).reshape(-1, hs[0].shape[1])

    def ref_z_motion(self, m_code, h0n, stepn):
        """reference model.py:321-334 Text2Gist unroll; h0n/stepn injected
        in place of the reference's in-place normal_ draws."""
        if m_code.dim() == 2:
            m_code = m_code.unsqueeze(1).repeat(1, stepn.shape[1], 1)
        h = self.m_net(h0n)
        hs = []
        for t in range(stepn.shape[1]):
            e_t = torch.cat([stepn[:, t], m_code[:, t]], dim=1)
            h = self.recurrent(e_t, h)
            hs.append(h)
        return torch.stack(hs, dim=1).reshape(-1, hs[0].shape[1])

    def ref_sample_videos(self, motion, content, eps, h0n, stepn, quirk):
        """reference model.py:348-423 sample_videos, end to end. `quirk`
        selects the reference's content tiling (model.py:361
        `r_mu.repeat(video_len, 1)` — row i gets r_mu[i % B]) vs the
        corrected per-sample repeat_interleave; the two coincide at B=1."""
        B, T_ = motion.shape[0], motion.shape[1]
        x = torch.relu(self.ca_net_fc(content.reshape(B, -1)))
        cond = x.shape[1] // 2
        r_mu, r_logvar = x[:, :cond], x[:, cond:]
        r_code = r_mu + torch.exp(0.5 * r_logvar) * eps
        if quirk:
            c_mu = r_mu.repeat(T_, 1)
        else:
            c_mu = r_mu.repeat_interleave(T_, dim=0)
        crnn = self.ref_mocornn(motion, r_code)
        zm = self.ref_z_motion(motion, h0n, stepn)
        mc = self.dfn(motion.reshape(-1, motion.shape[2]), crnn)
        return self.decode(torch.cat([zm, c_mu, mc], dim=1))

    def ref_sample_images(self, motion, content, h0n, stepn):
        """reference model.py:426-483 sample_images (single-frame path;
        the CA draw happens there too but c_code is discarded — only c_mu
        feeds the trunk, so no eps argument)."""
        B = motion.shape[0]
        x = torch.relu(self.ca_net_fc(content.reshape(B, -1)))
        cond = x.shape[1] // 2
        c_mu = x[:, :cond]
        crnn = self.ref_mocornn(motion, c_mu)
        zm = self.ref_z_motion(motion, h0n, stepn)
        mc = self.dfn(motion, crnn)
        return self.decode(torch.cat([zm, c_mu, mc], dim=1))


def _mini_flax(cascade, fused_upsample="off", torch_repeat_quirk=False):
    return StoryGenerator(
        video_len=T,
        motion_dim=MOTION,
        content_dim=COND,
        noise_dim=NOISE,
        gf_dim=NGF,
        gf_dim_seg=NGF_SEG,
        text_dim=TEXT,
        use_segment=True,
        cascade=cascade,
        filter_num=FN,
        filter_size=FS,
        image_size=IMSIZE_F,
        fused_upsample=fused_upsample,
        torch_repeat_quirk=torch_repeat_quirk,
    )


# "off" = bit-faithful naive reduction order; "deconv" = the production
# default decode path (cfg.FUSED_UPSAMPLE) — ported weights must decode
# identically through BOTH (the fused lowering only reorders the reduction).
@pytest.mark.parametrize("fused_upsample", ["off", "deconv"])
@pytest.mark.parametrize("cascade", [False, True])
def test_ported_decode_matches_torch(cascade, fused_upsample):
    torch.manual_seed(0)
    tm = TorchMiniG(cascade).eval()
    variables = port_generator_state_dict(
        tm.state_dict_ref_names(), use_segment=True, cascade=cascade
    )

    gen = _mini_flax(cascade, fused_upsample)
    rng = np.random.default_rng(0)
    B = 4
    zmc = rng.standard_normal((B, NINPUT)).astype(np.float32)

    with torch.no_grad():
        t_img, t_mask = tm.decode(torch.tensor(zmc))

    with jax.default_matmul_precision("highest"):
        frames, latents, mask = gen.apply(
            variables, jnp.asarray(zmc), False, method="_decode"
        )
    # ours: NHWC tanh'd already inside _decode
    np.testing.assert_allclose(
        np.asarray(frames).transpose(0, 3, 1, 2),
        t_img.numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(mask).transpose(0, 3, 1, 2), t_mask.numpy(), rtol=2e-3, atol=2e-3
    )


def test_ported_ca_net_and_dfn_match_torch():
    torch.manual_seed(1)
    tm = TorchMiniG(False).eval()
    variables = port_generator_state_dict(
        tm.state_dict_ref_names(), use_segment=True, cascade=False
    )
    gen = _mini_flax(False)
    rng = np.random.default_rng(1)
    B = 4

    content = rng.standard_normal((B, TEXT * T)).astype(np.float32)
    with torch.no_grad():
        x = torch.relu(tm.ca_net_fc(torch.tensor(content)))
        t_mu, t_logvar = x[:, :COND], x[:, COND:]

    def flax_encode(mdl, c):
        _, mu, logvar = mdl.ca_net(jnp.asarray(c), sample=False)
        return mu, logvar

    with jax.default_matmul_precision("highest"):
        mu, logvar = gen.apply(variables, content, method=flax_encode)
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(), rtol=1e-4, atol=1e-5)

    # DFN fusion path (image_net + filter_net + batched conv, eval-mode BN)
    m_flat = rng.standard_normal((B * T, MOTION)).astype(np.float32)
    crnn = rng.standard_normal((B * T, COND)).astype(np.float32)
    with torch.no_grad():
        t_mc = tm.dfn(torch.tensor(m_flat), torch.tensor(crnn))

    def flax_dfn(mdl, m, c):
        return mdl._dfn_fuse(jnp.asarray(m), jnp.asarray(c), train=False)

    with jax.default_matmul_precision("highest"):
        mc = gen.apply(variables, m_flat, crnn, method=flax_dfn)
    np.testing.assert_allclose(np.asarray(mc), t_mc.numpy(), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Full-path parity: sample_videos / sample_images end-to-end at B >= 3 with
# IDENTICAL noise, parametrized over both content tilings. This is the test
# the decode-only pin above cannot replace: the model.py:361 tiling
# mispairing (and any flatten-order slip) only shows at B > 1 on the full
# path. Noise sharing: jax.random.normal is tapped during the (eager) flax
# forward and the recorded draws are injected into the torch replica.
# ---------------------------------------------------------------------------

def _tap_noise(monkeypatch):
    draws = []
    real = jax.random.normal

    def tap(key, shape=(), dtype=jnp.float32):
        x = real(key, shape, dtype)
        # flax validates param shapes by running init_fns under
        # jax.eval_shape (core/scope.py), which also hits this tap with
        # tracers — only concrete noise draws are the model's sampling
        if not isinstance(x, jax.core.Tracer):
            draws.append(np.asarray(x, np.float32))
        return x

    monkeypatch.setattr(jax.random, "normal", tap)
    return draws


@pytest.mark.parametrize("quirk", [False, True])
@pytest.mark.parametrize("cascade", [False, True])
def test_full_path_sample_videos_matches_torch(cascade, quirk, monkeypatch):
    torch.manual_seed(2)
    tm = TorchMiniG(cascade).eval()
    variables = port_generator_state_dict(
        tm.state_dict_ref_names(), use_segment=True, cascade=cascade
    )
    gen = _mini_flax(cascade, torch_repeat_quirk=quirk)
    rng = np.random.default_rng(2)
    B = 4  # > video_len would also work; what matters is B > 1
    motion = rng.standard_normal((B, T, MOTION)).astype(np.float32)
    content = rng.standard_normal((B, T, TEXT)).astype(np.float32)

    draws = _tap_noise(monkeypatch)
    with jax.default_matmul_precision("highest"):
        out = gen.apply(
            variables, jnp.asarray(motion), jnp.asarray(content), True, False,
            method="sample_videos", rngs={"noise": jax.random.PRNGKey(7)},
        )
    # draw order pinned: CA eps, motion-GRU h0, per-step noise
    assert [d.shape for d in draws] == [(B, COND), (B, MOTION), (B, T, NOISE)]
    eps, h0n, stepn = (torch.tensor(d) for d in draws)
    with torch.no_grad():
        t_img, t_mask = tm.ref_sample_videos(
            torch.tensor(motion), torch.tensor(content), eps, h0n, stepn, quirk
        )

    video = np.asarray(out.image)  # (B, T, 64, 64, 3)
    flat = video.reshape(-1, *video.shape[2:]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(flat, t_img.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.seg).transpose(0, 3, 1, 2), t_mask.numpy(),
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.parametrize("cascade", [False, True])
def test_full_path_sample_images_matches_torch(cascade, monkeypatch):
    torch.manual_seed(3)
    tm = TorchMiniG(cascade).eval()
    variables = port_generator_state_dict(
        tm.state_dict_ref_names(), use_segment=True, cascade=cascade
    )
    gen = _mini_flax(cascade)
    rng = np.random.default_rng(3)
    B = 4
    motion = rng.standard_normal((B, MOTION)).astype(np.float32)
    content = rng.standard_normal((B, T, TEXT)).astype(np.float32)

    draws = _tap_noise(monkeypatch)
    with jax.default_matmul_precision("highest"):
        out = gen.apply(
            variables, jnp.asarray(motion), jnp.asarray(content), True, False,
            method="sample_images", rngs={"noise": jax.random.PRNGKey(9)},
        )
    assert [d.shape for d in draws] == [(B, COND), (B, MOTION), (B, 1, NOISE)]
    _eps, h0n, stepn = (torch.tensor(d) for d in draws)
    with torch.no_grad():
        t_img, t_mask = tm.ref_sample_images(
            torch.tensor(motion), torch.tensor(content), h0n, stepn
        )
    np.testing.assert_allclose(
        np.asarray(out.image).transpose(0, 3, 1, 2), t_img.numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out.seg).transpose(0, 3, 1, 2), t_mask.numpy(),
        rtol=2e-3, atol=2e-3,
    )


def test_repeat_quirk_changes_output_at_batch_gt1():
    """Sanity for the parametrization above: the two tilings genuinely
    diverge at B > 1 (at B = 1 they coincide, which is why the old
    decode-only test could never catch a quirk slip)."""
    torch.manual_seed(4)
    tm = TorchMiniG(False).eval()
    variables = port_generator_state_dict(
        tm.state_dict_ref_names(), use_segment=True, cascade=False
    )
    rng = np.random.default_rng(4)
    B = 4
    motion = rng.standard_normal((B, T, MOTION)).astype(np.float32)
    content = rng.standard_normal((B, T, TEXT)).astype(np.float32)

    outs = {}
    for quirk in (False, True):
        gen = _mini_flax(False, torch_repeat_quirk=quirk)
        out = gen.apply(
            variables, jnp.asarray(motion), jnp.asarray(content), False, False,
            method="sample_videos", rngs={"noise": jax.random.PRNGKey(11)},
        )
        outs[quirk] = np.asarray(out.image)
    assert not np.allclose(outs[False], outs[True], atol=1e-4)
