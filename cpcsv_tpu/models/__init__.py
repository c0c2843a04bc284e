from cpcsv_tpu.models.generator import StoryGenerator, GeneratorOutput
from cpcsv_tpu.models.discriminators import (
    ImageDiscriminator,
    SegDiscriminator,
    StoryDiscriminator,
    DGetLogits,
)
from cpcsv_tpu.models.video_encoder import VideoEncoder
from cpcsv_tpu.models.factory import build_models, generator_from_config

__all__ = [
    "StoryGenerator",
    "GeneratorOutput",
    "ImageDiscriminator",
    "SegDiscriminator",
    "StoryDiscriminator",
    "DGetLogits",
    "VideoEncoder",
    "build_models",
    "generator_from_config",
]
