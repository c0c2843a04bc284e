"""Discriminator weight-porting parity: build torch models with the
REFERENCE's exact wiring (STAGE1_D_IMG / STAGE1_D_SEG / STAGE1_D_STY_V2 /
D_GET_LOGITS / VideoEncoder, reference model.py:68-97,151-210,487-618
including torch.nn.utils.spectral_norm state), port the state_dicts with
port_discriminator_state_dict, and compare eval-mode forwards at fp32.

SN subtlety pinned here: torch eval computes sigma from the STORED (u, v)
buffers while our SNConv recomputes v = normalize(W^T u) from the stored u
(ops/spectral_norm.py) — identical once power iteration has converged, so
the replicas' (u, v) are converged in-place before comparison (as they are
in any real trained checkpoint).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import spectral_norm as sn

from cpcsv_tpu.models.discriminators import (
    ImageDiscriminator,
    SegDiscriminator,
    StoryDiscriminator,
)
from cpcsv_tpu.models.video_encoder import VideoEncoder
from cpcsv_tpu.utils.port_torch import (
    port_discriminator_state_dict,
    port_video_encoder_state_dict,
)

NDF, TEXT, LABELS, COND, T = 16, 20, 3, 8, 3
NEF = COND + TEXT + LABELS  # 31


class TorchDGetLogits(nn.Module):
    """reference D_GET_LOGITS (model.py:68-97), bcondition=True."""

    def __init__(self, ndf, nef):
        super().__init__()
        self.ef_dim = nef
        self.outlogits = nn.Sequential(
            sn(nn.Conv2d(ndf * 8 + nef, ndf * 8, 3, 1, 1, bias=False)),
            nn.BatchNorm2d(ndf * 8),
            nn.LeakyReLU(0.2, inplace=True),
            sn(nn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4)),
            nn.Sigmoid(),
        )

    def forward(self, h_code, c_code):
        c = c_code.view(-1, self.ef_dim, 1, 1).repeat(1, 1, 4, 4)
        return self.outlogits(torch.cat((h_code, c), 1)).view(-1)


class TorchMiniVideoEncoder(nn.Module):
    """reference VideoEncoder (model.py:151-210) at its REAL channel dims
    (they are hard-coded in the reference, not config-derived)."""

    def __init__(self):
        super().__init__()
        stem = nn.Sequential(
            sn(nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False)),
            nn.BatchNorm3d(45),
            nn.ReLU(inplace=True),
            sn(nn.Conv3d(45, 64, (1, 1, 1), (1, 1, 1), (1, 0, 0), bias=False)),
            nn.BatchNorm3d(64),
            nn.ReLU(inplace=True),
        )
        body = []
        specs = (
            (64, 128, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            (128, 128, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
            (128, 128, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            (128, 256, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
            (256, 256, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            (256, 512, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
            (512, 512, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
            (512, 512, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
        )
        for ci, co, k, s, p in specs:
            body += [
                sn(nn.Conv3d(ci, co, k, s, p, bias=False)),
                nn.BatchNorm3d(co),
                nn.LeakyReLU(0.2),
            ]
        self.pool = nn.AdaptiveAvgPool3d(1)
        self.story_encoder = nn.Sequential(stem, *body)
        self.detector = nn.Sequential(
            sn(nn.Linear(512, 128)),
            nn.BatchNorm1d(128),
            nn.ReLU(),
            sn(nn.Linear(128, 1)),
        )

    def forward(self, story):
        latents = self.pool(self.story_encoder(story))
        return self.detector(latents.view(story.shape[0], -1))


class TorchMiniD(nn.Module):
    """reference STAGE1_D_IMG/SEG (sn_first=False) or STAGE1_D_STY_V2
    (sn_first=True) at mini channel dims."""

    def __init__(self, in_ch=3, sn_first=False, use_categories=True, seq=False):
        super().__init__()
        ndf = NDF
        first = nn.Conv2d(in_ch, ndf, 4, 2, 1, bias=False)
        layers = [sn(first) if sn_first else first, nn.LeakyReLU(0.2, inplace=True)]
        for m_in, m_out in ((1, 2), (2, 4), (4, 8)):
            layers += [
                sn(nn.Conv2d(ndf * m_in, ndf * m_out, 4, 2, 1, bias=False)),
                nn.BatchNorm2d(ndf * m_out),
                nn.LeakyReLU(0.2, inplace=True),
            ]
        self.encode_img = nn.Sequential(*layers)
        self.get_cond_logits = TorchDGetLogits(ndf, NEF)
        if use_categories:
            self.cate_classify = nn.Conv2d(ndf * 8, LABELS, 4, 4, 1, bias=False)
        if seq:
            self.seq_consisten_model = TorchMiniVideoEncoder()


def converge_sn(module, iters=300):
    """Run power iteration to convergence directly on every SN layer's
    (weight_orig, u, v) buffers — the state a trained torch checkpoint is in."""
    with torch.no_grad():
        for m in module.modules():
            if hasattr(m, "weight_orig"):
                w = m.weight_orig.detach().reshape(m.weight_orig.shape[0], -1)
                u = m.weight_u.detach().clone()
                for _ in range(iters):
                    v = F.normalize(w.t() @ u, dim=0, eps=1e-12)
                    u = F.normalize(w @ v, dim=0, eps=1e-12)
                m.weight_u.copy_(u)
                m.weight_v.copy_(v)


def _check_tree_match(ported, template):
    assert jax.tree_util.tree_structure(ported) == jax.tree_util.tree_structure(
        jax.tree.map(lambda x: x, template)
    ), "ported variable tree differs from the module's init tree"
    jax.tree.map(
        lambda p, t: np.testing.assert_equal(np.shape(p), np.shape(t)),
        ported,
        template,
    )


@pytest.mark.parametrize("kind", ["image", "seg"])
def test_ported_image_seg_discriminator_matches_torch(kind):
    torch.manual_seed(3 if kind == "image" else 4)
    in_ch = 3 if kind == "image" else 1
    tm = TorchMiniD(in_ch=in_ch, sn_first=False, use_categories=True)
    # realistic BN running stats: a few train-mode encoder+head passes
    rng = np.random.default_rng(7)
    with torch.no_grad():
        for _ in range(3):
            x = torch.tensor(rng.standard_normal((6, in_ch, 64, 64)), dtype=torch.float32)
            c = torch.tensor(rng.standard_normal((6, NEF)), dtype=torch.float32)
            tm.get_cond_logits(tm.encode_img(x), c)
    converge_sn(tm)
    tm.eval()

    variables = port_discriminator_state_dict(tm.state_dict(), kind)
    cls = ImageDiscriminator if kind == "image" else SegDiscriminator
    mod = cls(ndf=NDF, nef=COND, text_dim=TEXT, label_num=LABELS, in_channels=in_ch)

    B = 4
    img = rng.standard_normal((B, in_ch, 64, 64)).astype(np.float32)
    cond = rng.standard_normal((B, NEF)).astype(np.float32)

    template = jax.eval_shape(
        lambda: mod.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, 64, 64, in_ch)),
            jnp.zeros((B, NEF)),
            train=False,
            method="full_forward",
        )
    )
    _check_tree_match(variables, template)

    with torch.no_grad():
        t_feat = tm.encode_img(torch.tensor(img))
        t_prob = tm.get_cond_logits(t_feat, torch.tensor(cond))
        t_cate = tm.cate_classify(t_feat).view(B, LABELS)

    with jax.default_matmul_precision("highest"):
        feat, logits, cate = mod.apply(
            variables,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(cond),
            train=False,
            method="full_forward",
        )
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2), t_feat.numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        jax.nn.sigmoid(logits), t_prob.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(cate), t_cate.numpy(), rtol=2e-3, atol=2e-3)


def test_ported_story_discriminator_matches_torch():
    torch.manual_seed(5)
    tm = TorchMiniD(in_ch=3, sn_first=True, use_categories=False)
    rng = np.random.default_rng(11)
    with torch.no_grad():
        for _ in range(3):
            x = torch.tensor(
                rng.standard_normal((6, 3, 64, 64)), dtype=torch.float32
            )
            c = torch.tensor(rng.standard_normal((2, NEF)), dtype=torch.float32)
            feat = tm.encode_img(x).view(2, T, NDF * 8, 4, 4).mean(1)
            tm.get_cond_logits(feat, c)
    converge_sn(tm)
    tm.eval()

    variables = port_discriminator_state_dict(tm.state_dict(), "story")
    mod = StoryDiscriminator(ndf=NDF, nef=COND, text_dim=TEXT, label_num=LABELS)

    B = 2
    story = rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32)
    cond = rng.standard_normal((B, NEF)).astype(np.float32)

    template = jax.eval_shape(
        lambda: mod.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, T, 64, 64, 3)),
            jnp.zeros((B, NEF)),
            train=False,
            method="full_forward",
        )
    )
    _check_tree_match(variables, template)

    with torch.no_grad():
        # reference forward: (B,C,T,H,W) -> per-frame encode -> mean over T
        frames = torch.tensor(story.transpose(0, 1, 4, 2, 3).reshape(-1, 3, 64, 64))
        t_feat = tm.encode_img(frames).view(B, T, NDF * 8, 4, 4).mean(1)
        t_prob = tm.get_cond_logits(t_feat, torch.tensor(cond))

    with jax.default_matmul_precision("highest"):
        feat, logits, _ = mod.apply(
            variables,
            jnp.asarray(story),
            jnp.asarray(cond),
            train=False,
            method="full_forward",
        )
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2), t_feat.numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        jax.nn.sigmoid(logits), t_prob.numpy(), rtol=1e-3, atol=1e-4
    )


def test_ported_story_discriminator_with_seq_consistency():
    """The optional order-consistency branch (cfg.USE_SEQ_CONSISTENCY):
    seq_consisten_model.* keys must port through the story-D porter's prefix
    path and produce matching consistency logits."""
    torch.manual_seed(8)
    tm = TorchMiniD(in_ch=3, sn_first=True, use_categories=False, seq=True)
    converge_sn(tm, iters=50)
    tm.eval()

    variables = port_discriminator_state_dict(tm.state_dict(), "story")
    mod = StoryDiscriminator(
        ndf=NDF, nef=COND, text_dim=TEXT, label_num=LABELS, use_seq_consistency=True
    )

    B = 2
    rng = np.random.default_rng(17)
    story = rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32)
    cond = rng.standard_normal((B, NEF)).astype(np.float32)

    template = jax.eval_shape(
        lambda: mod.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, T, 64, 64, 3)),
            jnp.zeros((B, NEF)),
            train=False,
            method="full_forward",
        )
    )
    _check_tree_match(variables, template)

    with torch.no_grad():
        t_cons = tm.seq_consisten_model(torch.tensor(story.transpose(0, 4, 1, 2, 3)))

    with jax.default_matmul_precision("highest"):
        _, _, cons = mod.apply(
            variables,
            jnp.asarray(story),
            jnp.asarray(cond),
            train=False,
            method="full_forward",
        )
    np.testing.assert_allclose(np.asarray(cons), t_cons.numpy(), rtol=2e-3, atol=2e-3)


def test_ported_video_encoder_matches_torch():
    torch.manual_seed(6)
    tm = TorchMiniVideoEncoder()
    rng = np.random.default_rng(13)
    with torch.no_grad():
        for _ in range(2):
            tm(torch.tensor(rng.standard_normal((4, 3, T, 64, 64)), dtype=torch.float32))
    converge_sn(tm)
    tm.eval()

    variables = port_video_encoder_state_dict(tm.state_dict())
    mod = VideoEncoder()

    B = 2
    story = rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32)

    template = jax.eval_shape(
        lambda: mod.init(
            jax.random.PRNGKey(0), jnp.zeros((B, T, 64, 64, 3)), train=False
        )
    )
    _check_tree_match(variables, template)

    with torch.no_grad():
        t_out = tm(torch.tensor(story.transpose(0, 4, 1, 2, 3)))

    with jax.default_matmul_precision("highest"):
        out = mod.apply(variables, jnp.asarray(story), train=False)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), rtol=2e-3, atol=2e-3)
