"""Click-to-inspect debug probe.

Reference analog: the preview window's left-click handler fires a
center-of-pixel ray and prints the Intersection plus the scatter result
(window.rs:141-172 -> camera.rs:256-277).  rt_tpu exposes the same probe as
a function returning a plain dict (usable from the CLI, the HTTP viewer or
a notebook).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt_tpu import materials
from rt_tpu.camera import Camera
from rt_tpu.config import RenderConfig
from rt_tpu.geometry import nearest_hit
from rt_tpu.scene import SceneData

_MAT_NAMES = {0: "Lambertian", 1: "Metal", 2: "Dielectric"}


def debug_pixel(
    scene: SceneData,
    camera: Camera,
    x: float,
    y: float,
    cfg: RenderConfig = RenderConfig(),
) -> dict | None:
    """One-bounce probe at pixel (x, y); None when the ray hits the sky
    (reference prints "Ray missed any objects (hit the skybox).",
    window.rs:168)."""
    org, dirn = camera.debug_ray(x, y)
    org = org[None, :]
    dirn = dirn[None, :]
    rec = nearest_hit(scene, org, dirn, cfg.t_min, cfg.t_max, cfg.compat)
    if not bool(rec.hit[0]):
        return None
    attenuation, scattered = materials.scatter(
        scene, rec, dirn, jax.random.key(cfg.seed), cfg.compat
    )
    mat_kind = int(scene.mat_kind[jnp.clip(rec.material[0], 0, scene.mat_kind.shape[0] - 1)])
    return {
        "point": [float(v) for v in rec.point[0]],
        "normal": [float(v) for v in rec.normal[0]],
        "t": float(rec.t[0]),
        "prim": int(rec.prim[0]),
        "is_front_face": bool(rec.front[0]),
        "uv": [float(v) for v in rec.uv[0]],
        "material": _MAT_NAMES.get(mat_kind, str(mat_kind)),
        "material_id": int(rec.material[0]),
        "attenuation": [float(v) for v in attenuation[0]],
        "scattered_dir": [float(v) for v in scattered[0]],
    }
