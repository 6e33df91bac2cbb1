"""ASCII PPM (P3) writer/reader.

Byte-compatible with the reference's ``Camera::write_image``
(camera.rs:343-364): header ``P3``, a ``width height`` line with the
``# width, height`` comment, ``255 # max color value``, then
gamma-corrected u8 triplets, space-separated, one image row per line.
"""

from __future__ import annotations

import numpy as np

from rt_tpu import color as color_mod


def write_ppm(path: str, image_linear: np.ndarray) -> None:
    """Write a linear f32[H,W,3] image as gamma-corrected ASCII PPM."""
    h, w, _ = image_linear.shape
    rgb = np.asarray(color_mod.to_u8_gamma(np.asarray(image_linear, np.float32)))
    lines = [f"P3\n{w} {h} # width, height\n255 # max color value\n"]
    for y in range(h):
        row = " ".join(f"{r} {g} {b}" for r, g, b in rgb[y])
        lines.append(row + "\n")
    with open(path, "w") as f:
        f.writelines(lines)


def read_ppm(path: str) -> np.ndarray:
    """Read an ASCII P3 PPM into u8[H,W,3] (test utility)."""
    with open(path) as f:
        text = f.read()
    tokens = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        tokens.extend(line.split())
    assert tokens[0] == "P3", "only P3 supported"
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4 : 4 + w * h * 3], np.int32).reshape(h, w, 3)
    assert maxval == 255
    return data.astype(np.uint8)
