from cpcsv_tpu.ops.blocks import (
    Conv3x3,
    Conv4x4s2,
    UpBlock,
    DownBlock,
    nearest_upsample_2x,
    normal_kernel_init,
    bn_scale_init,
)
from cpcsv_tpu.ops.gru import GRUCell, gru_scan
from cpcsv_tpu.ops.dynamic_filter import dynamic_filter_conv1d
from cpcsv_tpu.ops.spectral_norm import SNDense, SNConv

__all__ = [
    "Conv3x3",
    "Conv4x4s2",
    "UpBlock",
    "DownBlock",
    "nearest_upsample_2x",
    "normal_kernel_init",
    "bn_scale_init",
    "GRUCell",
    "gru_scan",
    "dynamic_filter_conv1d",
    "SNDense",
    "SNConv",
]
