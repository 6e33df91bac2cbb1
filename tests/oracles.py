"""Scalar NumPy oracles transcribed from the reference's cited formulas.

Each function is a straight, readable transcription of the math at the
cited reference lines (f64 NumPy scalars), used to validate the batched
JAX implementations — the unit-test strategy SURVEY.md §4 prescribes.
"""

from __future__ import annotations

import numpy as np


def halton_sequence(base: int, length: int) -> list[float]:
    """Iterative Halton generator (camera.rs:140-165)."""
    out = []
    n, d = 0, 1
    for _ in range(length):
        x = d - n
        if x == 1:
            n = 1
            d *= base
        else:
            y = d // base
            while x < y:
                y //= base
            n = (base + 1) * y - x
        out.append(n / d)
    return out


def uncharted2_tonemap(x: np.ndarray) -> np.ndarray:
    """hittable.rs:51-66."""
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return (x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f) - e / f


def uncharted2(x: np.ndarray) -> np.ndarray:
    """hittable.rs:70-79."""
    curr = uncharted2_tonemap(1.1 * x)
    white_scale = 1.0 / uncharted2_tonemap(np.full(3, 11.2))
    return white_scale * curr


def sphere_hit_t(center, radius, origin, direction, t_min, t_max):
    """Sphere quadratic root selection (hittable.rs:319-338); returns t or
    None."""
    center, origin, direction = map(np.asarray, (center, origin, direction))
    oc = center - origin
    a = direction @ direction
    h = direction @ oc
    c = oc @ oc - radius * radius
    disc = h * h - a * c
    if disc < 0:
        return None
    sd = np.sqrt(disc)
    t = (h - sd) / a
    if not (t_min <= t < t_max):
        t = (h + sd) / a
        if not (t_min <= t < t_max):
            return None
    return t


def triangle_hit(a, b, c, origin, direction, t_min, t_max, eps=2.220446049250313e-16):
    """Möller–Trumbore with backface culling (hittable.rs:411-494);
    returns (t, u, v) or None."""
    a, b, c, origin, direction = map(np.asarray, (a, b, c, origin, direction))
    e1, e2 = b - a, c - a
    u_vec = np.cross(direction, e2)
    det = e1 @ u_vec
    if det < eps:
        return None
    inv_det = 1.0 / det
    ao = origin - a
    u = (ao @ u_vec) * inv_det
    if not (0.0 <= u <= 1.0):
        return None
    v_vec = np.cross(ao, e1)
    v = (direction @ v_vec) * inv_det
    if v < 0.0 or u + v > 1.0:
        return None
    t = (e2 @ v_vec) * inv_det
    if not (t_min <= t < t_max) or t <= eps:
        return None
    return t, u, v


def triangle_uv_bbox(uv_a, uv_b, uv_c, u, v):
    """The UV-bbox-remap quirk (hittable.rs:466-481)."""
    uv_a, uv_b, uv_c = map(np.asarray, (uv_a, uv_b, uv_c))
    left = min(uv_a[0], uv_b[0], uv_c[0])
    right = max(uv_a[0], uv_b[0], uv_c[0])
    bot = min(uv_a[1], uv_b[1], uv_c[1])
    top = max(uv_a[1], uv_b[1], uv_c[1])
    return np.array([left + (right - left) * u, bot + (top - bot) * v])


def unit_sphere_uv_facing(point, face_dir):
    """hittable.rs:367-406: Ry(pitch) @ Rz(-yaw) rotation then spherical."""
    point, face_dir = np.asarray(point), np.asarray(face_dir)
    pitch = np.arctan2(face_dir[2], np.hypot(face_dir[0], face_dir[1]))
    yaw = np.arctan2(face_dir[1], face_dir[0])

    def ry(t):
        return np.array(
            [[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]]
        )

    def rz(t):
        return np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )

    rot = ry(pitch) @ rz(-yaw)
    p = rot @ point
    theta = np.arccos(-p[2])
    phi = np.arctan2(p[1], p[0]) + np.pi
    phi = np.mod(phi, 2 * np.pi)
    return np.array([phi / (2 * np.pi), theta / np.pi])


def reflect(d, n):
    """material.rs:46-51."""
    d, n = np.asarray(d), np.asarray(n)
    return d - 2.0 * (d @ n) * n


def refract(unit_d, n, ratio):
    """material.rs:53-60."""
    unit_d, n = np.asarray(unit_d), np.asarray(n)
    cos_theta = min(-(unit_d @ n), 1.0)
    r_out_perp = (unit_d + n * cos_theta) * ratio
    x = -np.sqrt(abs(1.0 - r_out_perp @ r_out_perp))
    return n * x + r_out_perp


def schlick(cosine, refractive_index):
    """material.rs:181-186."""
    r0 = ((1.0 - refractive_index) / (1.0 + refractive_index)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def checker_is_even(point, inv_scale):
    """texture.rs:62-67.  Rust's % keeps the dividend's sign but "== 0"
    marks exactly the even sums in both languages."""
    cells = np.floor(inv_scale * np.asarray(point)).astype(np.int64)
    return cells.sum() % 2 == 0


def image_texel(width, height, u, v):
    """texture.rs:107-113: clamped UV, truncating texel index."""
    u = min(max(u, 0.0), 1.0)
    v = min(max(v, 0.0), 1.0)
    return int(u * (width - 1)), int(v * (height - 1))


def camera_frame(center, lookat, up, focus_distance, defocus_angle, width, height, vfov):
    """Camera::new precomputation (camera.rs:169-227)."""
    center, lookat, up = map(lambda x: np.asarray(x, np.float64), (center, lookat, up))
    w = center - lookat
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    h = np.tan(np.radians(vfov) / 2.0)
    viewport_height = 2.0 * h * focus_distance
    viewport_width = viewport_height * (width / height)
    viewport_u = u * viewport_width
    viewport_v = -v * viewport_height
    pixel_du = viewport_u / width
    pixel_dv = viewport_v / height
    vp_upper_left = center - w * focus_distance - viewport_u / 2 - viewport_v / 2
    pixel00 = vp_upper_left + (pixel_du + pixel_dv) / 2
    defocus_radius = focus_distance * np.tan(np.radians(defocus_angle / 2))
    return dict(
        pixel00=pixel00,
        pixel_du=pixel_du,
        pixel_dv=pixel_dv,
        defocus_u=u * defocus_radius,
        defocus_v=v * defocus_radius,
    )
