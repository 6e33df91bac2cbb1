"""Host-side I/O: image writers (PPM/PNG), decoders, and mesh loaders."""

from rt_tpu.io.ppm import write_ppm, read_ppm
from rt_tpu.io.png_io import write_png, load_image

__all__ = ["write_ppm", "read_ppm", "write_png", "load_image"]
