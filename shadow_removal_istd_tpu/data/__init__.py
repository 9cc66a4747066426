"""Datasets and host pipeline: ISTD directory & HDF5 readers, synthetic
data, batch pipeline, device-resident cache."""

from shadow_removal_istd_tpu.data.istd import ISTDDataset  # noqa: F401
from shadow_removal_istd_tpu.data.pipeline import BatchPipeline  # noqa: F401
from shadow_removal_istd_tpu.data.synthetic import (  # noqa: F401
    synthetic_triplets,
    write_istd_layout,
)
from shadow_removal_istd_tpu.data.device_cache import (  # noqa: F401
    DeviceDatasetCache,
)
