from probav_tpu.data.loader import Batcher, prefetch_to_device

__all__ = ["Batcher", "prefetch_to_device"]
