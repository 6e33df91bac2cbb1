"""Progressive engine, checkpoint/resume, CLI, viewer."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rt_tpu import scenes
from rt_tpu.config import ProgressiveSchedule, RenderConfig
from rt_tpu.progressive import ProgressiveRenderer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_schedule_totals():
    passes = ProgressiveSchedule.reference().passes()
    assert len(passes) == 237  # window.rs:233-247
    assert sum(passes) == 40055
    assert passes[:9] == (1, 2, 4, 8, 8, 16, 16, 32, 32)


@pytest.fixture
def small_setup():
    camera = scenes.cam1(16, 12)
    scene = scenes.cover_scene(2, 2, camera, seed=0)
    cfg = RenderConfig(width=16, height=12, max_depth=6)
    return scene, camera, cfg


def test_progressive_accumulates(small_setup, tmp_path, capsys):
    scene, camera, cfg = small_setup
    metrics_path = str(tmp_path / "metrics.jsonl")
    r = ProgressiveRenderer(scene, camera, cfg, metrics_path=metrics_path)
    m1 = r.step()
    m2 = r.step()
    assert m1["total_spp"] == 1 and m2["total_spp"] == 3  # 1, 2, ...
    assert m2["mray_per_s"] > 0
    img = r.state.image
    assert img.shape == (12, 16, 3)
    assert np.all(np.isfinite(img))
    lines = open(metrics_path).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["sweep"] == 1
    out = capsys.readouterr().out
    assert "On sweep 1 adding 1 sample(s)" in out  # reference print parity
    assert "million rays/second" in out


def test_progressive_checkpoint_resume(small_setup, tmp_path):
    scene, camera, cfg = small_setup
    ckpt = str(tmp_path / "ck.npz")
    r1 = ProgressiveRenderer(scene, camera, cfg, checkpoint_path=ckpt)
    r1.step()
    r1.step()
    r1.step()
    # Fresh renderer resumes from sweep 4 with identical accumulator.
    r2 = ProgressiveRenderer(scene, camera, cfg, checkpoint_path=ckpt)
    assert r2.state.pass_index == 3
    assert r2.state.total_spp == r1.state.total_spp
    np.testing.assert_array_equal(r2.state.accum, r1.state.accum)
    m = r2.step()
    assert m["sweep"] == 4


def test_progressive_run_with_stop(small_setup):
    scene, camera, cfg = small_setup
    r = ProgressiveRenderer(scene, camera, cfg)
    count = [0]

    def should_stop():
        return count[0] >= 2

    def on_sweep(img, m):
        count[0] += 1

    r.run(max_passes=10, on_sweep=on_sweep, should_stop=should_stop)
    assert count[0] == 2  # closing-flag analog (window.rs:271)


def test_cli_end_to_end(tmp_path):
    out = str(tmp_path / "o.png")
    proc = subprocess.run(
        [
            sys.executable, "-m", "rt_tpu.cli",
            "--cpu", "--scene", "checkered", "--size", "24x16",
            "--spp", "2", "--max-depth", "4", "--out", out,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert os.path.exists(out)
    assert "Rendering a scene with 2 shapes" in proc.stderr
    from PIL import Image

    img = Image.open(out)
    assert img.size == (24, 16)


def test_cli_probe(tmp_path):
    proc = subprocess.run(
        [
            sys.executable, "-m", "rt_tpu.cli",
            "--cpu", "--scene", "checkered", "--size", "24x16",
            "--probe", "12,8",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    info = json.loads(proc.stdout)
    assert "material" in info or "miss" in info


def test_viewer_serves_frames(small_setup):
    import urllib.request

    from rt_tpu.viewer import PreviewServer

    server = PreviewServer(0, probe=lambda x, y: {"x": x, "y": y}).start()
    try:
        base = f"http://localhost:{server.port}"
        page = urllib.request.urlopen(base).read().decode()
        assert "rt_tpu preview" in page
        server.update(np.full((4, 4, 3), 0.5, np.float32), {"sweep": 1})
        png = urllib.request.urlopen(base + "/frame.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        status = json.loads(urllib.request.urlopen(base + "/status").read())
        assert status["sweep"] == 1
        probe = json.loads(urllib.request.urlopen(base + "/probe?x=1&y=2").read())
        assert probe == {"x": 1.0, "y": 2.0}
    finally:
        server.stop()
