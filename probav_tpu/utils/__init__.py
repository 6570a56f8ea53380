from probav_tpu.utils.cache import enable_compile_cache
from probav_tpu.utils.io import read_png, write_png, dump_masked, load_npy

__all__ = ["read_png", "write_png", "dump_masked", "load_npy",
           "enable_compile_cache"]
