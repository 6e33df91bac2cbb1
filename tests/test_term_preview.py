"""Terminal preview encodings (term_preview.py)."""

import io

import numpy as np

from rt_tpu.term_preview import TerminalPreview, ansi_frame, kitty_frame


def _gradient(h=20, w=40):
    y = np.linspace(0, 1, h)[:, None, None]
    x = np.linspace(0, 1, w)[None, :, None]
    return np.concatenate([y + 0 * x, x + 0 * y, 0.5 + 0 * (x + y)], axis=2).clip(0, 1)


def test_ansi_frame_structure():
    frame = ansi_frame(_gradient(), max_cols=20)
    lines = frame.split("\n")
    assert all(line.endswith("\x1b[0m") for line in lines)
    # truecolor fg+bg per cell, half-block glyph present
    assert "\x1b[38;2;" in frame and "\x1b[48;2;" in frame and "▀" in frame
    # 20 cols x aspect-matched rows, two image rows per line
    assert 3 <= len(lines) <= 8


def test_ansi_frame_gamma_and_range():
    # Mid-gray linear 0.25 through the production gamma (1/2.2,
    # vec3.rs:39-42): 0.25**(1/2.2)*255 = 135.x -> 135/136.
    frame = ansi_frame(np.full((4, 4, 3), 0.25, np.float32), max_cols=4)
    assert "38;2;135;" in frame or "38;2;136;" in frame


def test_kitty_frame_chunking():
    frame = kitty_frame(_gradient(64, 128))
    assert frame.startswith("\x1b_Ga=T,f=100,m=")
    assert frame.endswith("\x1b\\")
    # every chunk closed, exactly one final m=0 chunk
    assert frame.count("\x1b_G") == frame.count("\x1b\\")
    assert frame.count("m=0;") == 1


def test_preview_updates_in_place():
    out = io.StringIO()
    tp = TerminalPreview(mode="ansi", max_cols=16, stream=out)
    tp.update(_gradient(), {"pass": 1, "mray_per_s": 12.3456})
    first = out.getvalue()
    assert "pass=1" in first and "mray_per_s=12.3" in first
    assert "\x1b[" in first and "F" not in first.split("\n")[0][:4]
    tp.update(_gradient(), {"pass": 2})
    second = out.getvalue()[len(first):]
    # second frame rewinds the cursor over the first
    assert second.startswith("\x1b[") and "F\x1b[J" in second[:12]
    assert "pass=2" in second
