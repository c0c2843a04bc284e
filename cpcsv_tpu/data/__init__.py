from cpcsv_tpu.data.legacy_text import TextDataset
from cpcsv_tpu.data.loader import DataLoader
from cpcsv_tpu.data.synthetic import SyntheticStoryDataset, SyntheticImageDataset

__all__ = [
    "DataLoader",
    "SyntheticStoryDataset",
    "SyntheticImageDataset",
    "TextDataset",
]
