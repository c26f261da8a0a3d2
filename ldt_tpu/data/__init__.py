"""Host-side data pipelines feeding numpy batches to the device."""

from ldt_tpu.data.loader import DataLoader
from ldt_tpu.data.shapenet55 import (
    ShapeNet15kPointClouds,
    cate_to_synsetid,
    get_data_loaders,
    get_datasets,
    synsetid_to_cate,
)

__all__ = [
    "DataLoader",
    "ShapeNet15kPointClouds",
    "cate_to_synsetid",
    "get_data_loaders",
    "get_datasets",
    "synsetid_to_cate",
]
