from cpcsv_tpu.utils.logging import MetricsLogger
from cpcsv_tpu.utils.image import (
    images_to_numpy,
    make_grid,
    save_story_results,
    save_image_results,
    save_all_img,
    to_ncthw,
    from_ncthw,
)

__all__ = [
    "MetricsLogger",
    "images_to_numpy",
    "make_grid",
    "save_story_results",
    "save_image_results",
    "save_all_img",
    "to_ncthw",
    "from_ncthw",
]
