from probav_tpu.utils.io import read_png, write_png, dump_masked, load_npy

__all__ = ["read_png", "write_png", "dump_masked", "load_npy"]
