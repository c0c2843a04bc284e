"""FSD / vFID — Frechet Story Distance, the paper's novel metric.

FID computed in the 512-d feature space of a Kinetics-pretrained R(2+1)D-18
over whole stories (reference `fid/vfid_score.py:154-174`). Default batch
size 50 and real-side .npz caching match the reference driver.
"""

from __future__ import annotations

from cpcsv_tpu.evaluation.features import activation_statistics
from cpcsv_tpu.evaluation.frechet import calculate_frechet_distance
from cpcsv_tpu.evaluation.r2plus1d import make_fsd_extractor


def fsd_score(
    r_stories,
    g_stories,
    batch_size: int = 50,
    normalize: bool = False,
    r_cache: str | None = None,
    extractor=None,
    weights_path: str | None = None,
) -> float:
    """r_stories[i] / g_stories[i] -> (T, H, W, 3) float story video.

    Parity quirks preserved: the reference's vFID loop accepts a `normalize`
    flag but never applies it (fid/vfid_score.py:88-90), and the R(2+1)D
    wrapper's resize/rescale is dead code (fid/residual2p1.py:36-49) — so
    features are computed on the raw [-1,1] 64x64 stories. The `normalize`
    argument is accepted for API parity and ignored the same way.
    """
    del normalize  # reference bug preserved: flag is accepted but unused
    if extractor is None:
        extractor = make_fsd_extractor(weights_path)
    m1, s1 = activation_statistics(r_stories, extractor, batch_size, False, r_cache)
    m2, s2 = activation_statistics(g_stories, extractor, batch_size, False)
    return calculate_frechet_distance(m1, s1, m2, s2)


# reference alias (vfid_score == fid_score in fid/vfid_score.py)
vfid_score = fsd_score
