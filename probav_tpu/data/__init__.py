from probav_tpu.data.loader import Batcher, prefetch_to_device
from probav_tpu.data import augment, ingest, pipeline, qc, random_patches

__all__ = [
    "Batcher", "prefetch_to_device",
    "augment", "ingest", "pipeline", "qc", "random_patches",
]
