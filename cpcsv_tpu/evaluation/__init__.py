from cpcsv_tpu.evaluation.frechet import (
    calculate_frechet_distance,
    calculate_activation_statistics,
)
from cpcsv_tpu.evaluation.ssim import ssim, ssim_score
from cpcsv_tpu.evaluation.fid import fid_score
from cpcsv_tpu.evaluation.fsd import fsd_score, vfid_score

__all__ = [
    "calculate_frechet_distance",
    "calculate_activation_statistics",
    "ssim",
    "ssim_score",
    "fid_score",
    "fsd_score",
    "vfid_score",
]
