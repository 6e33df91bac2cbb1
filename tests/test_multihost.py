"""2-process jax.distributed smoke test (VERDICT round-1 item 8).

Brings up a real 2-process / 4-virtual-device global mesh on CPU through
initialize_multihost and renders the same tiny scene the single-process
path renders; the wavefront's global (sample, pixel) RNG keying makes the
results bit-identical."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.wavefront import render_wavefront

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "img.npy"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count (2 each)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(i), str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, f"worker failed rc={rc}\n{stdout}\n{stderr[-3000:]}"

    got = np.load(out)

    W, H = 16, 12
    camera = scenes.cam1(W, H)
    scene = scenes.cover_scene(2, 2, camera, z=-0.2, seed=0)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    want = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), jax.random.key(0))
    ).reshape(H, W, 3)
    # Same RNG streams, so agreement is ~1 ulp: separate processes may
    # compile with different fusion/FMA choices, unlike the single-process
    # 8-device mesh (which is bit-identical, tests/test_distributed.py).
    np.testing.assert_allclose(got, want, atol=1e-6)
