"""Data pipeline: prompting, item processing, datasets, samplers."""

from mmada_parallel_tpu.data.dataset import (  # noqa: F401
    MetaDataset, LengthClusteredSampler)
from mmada_parallel_tpu.data.item_processor import AItemProcessor  # noqa: F401
from mmada_parallel_tpu.data.prompting import UniversalPrompting  # noqa: F401
