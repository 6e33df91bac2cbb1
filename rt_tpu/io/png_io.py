"""PNG output and image decoding.

Replaces the reference's use of the `image` crate (PNG/JPEG/WebP decode at
camera.rs:62-81, texture.rs:89-92).  Decoding happens on host via PIL and
lands in f32[H,W,3] arrays in [0,1] — the SoA device format — instead of
the reference's AoS ``Vec<(x, y, Vec3)>`` (24+ B/px; camera.rs:56-60).
"""

from __future__ import annotations

import numpy as np

from rt_tpu import color as color_mod


def write_png(path: str, image_linear: np.ndarray, gamma: bool = True) -> None:
    """Write a linear f32[H,W,3] image as 8-bit PNG (gamma-corrected by
    default, like the reference's final outputs)."""
    from PIL import Image

    arr = np.asarray(image_linear, np.float32)
    rgb = np.asarray(color_mod.to_u8_gamma(arr) if gamma else color_mod.to_u8(arr))
    Image.fromarray(rgb, "RGB").save(path)


def load_image(path_or_bytes) -> np.ndarray:
    """Decode an image file (PNG/JPEG/WebP/...) to f32[H,W,3] in [0,1].

    Reference analog: ``Image::from(DynamicImage)`` (camera.rs:62-81) —
    channels scaled by 1/255, no gamma handling (the reference treats texel
    values as linear; replicated for parity).
    """
    import io as _io

    from PIL import Image

    if isinstance(path_or_bytes, (bytes, bytearray)):
        img = Image.open(_io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    img = img.convert("RGB")
    return np.asarray(img, np.float32) / 255.0
