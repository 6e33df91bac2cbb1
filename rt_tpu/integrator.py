"""Wavefront path-tracing integrator.

The reference integrator is a recursive per-ray function (camera.rs:296-313):
nearest hit in [0.001, t_max) -> scatter -> Russian roulette at every depth
with p = max(attenuation channel) and survivor scaled 1/p (camera.rs:280-293)
-> recurse to max_depth=100; miss -> sky; absorb -> black.

TPU inversion: recursion cannot exist on TPU.  The integrator here advances
a SoA megabatch of rays (origin, direction, throughput, radiance, alive)
through a bounded ``lax.while_loop`` (forward) or fixed-length ``lax.scan``
(differentiable) with masked termination:

  radiance_i = sum over bounces of [throughput * sky on the miss bounce]
  throughput *= attenuation / p   (Russian-roulette-scaled, masked)

Semantics parity with raycast(depth):
- depth d hit with d == max_depth  -> absorbed black (no recursion allowed):
  here rays alive after the final iteration simply contribute nothing.
- RR applies at *every* bounce including the first (camera.rs:300-304).
- The miss branch normalizes the direction before the sky lookup
  (camera.rs:310-311).

Safety divergence: the reference panics when an attenuation channel exceeds
1 (gen_bool(p > 1), camera.rs:288); rt_tpu clamps p into (0, rr_clamp].

f32 robustness (the reference demonstrated f32 shadow acne and hides behind
f64, TODO.md:38-40): bounce origins are offset from the hit point along the
geometric normal, signed toward the outgoing hemisphere, scaled by local
magnitude — in addition to the reference's t_min=1e-3 epsilon.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt_tpu import materials, sky
from rt_tpu.config import RenderConfig
from rt_tpu.geometry import nearest_hit
from rt_tpu.scene import SceneData


def _bounce_step(scene: SceneData, cfg: RenderConfig, state, bounce_key, depth):
    """One wavefront bounce: intersect, accumulate sky on miss, scatter +
    Russian roulette on hit.  Pure function of (state, key, depth)."""
    org, dirn, throughput, radiance, alive = state

    rec = nearest_hit(scene, org, dirn, cfg.t_min, cfg.t_max, cfg.compat)

    # Miss -> sky (camera.rs:308-312).
    unit_dir = dirn / jnp.maximum(jnp.linalg.norm(dirn, axis=-1, keepdims=True), 1e-20)
    sky_rgb = sky.sky_color_toward(scene.sky, unit_dir)
    miss = alive & ~rec.hit
    radiance = radiance + jnp.where(miss[:, None], throughput * sky_rgb, 0.0)

    # Emissive hit -> deposit and terminate (extension; MAT_EMISSIVE).
    mat_id = jnp.clip(rec.material, 0, scene.mat_kind.shape[0] - 1)
    is_emissive = scene.mat_kind[mat_id] == 3
    from rt_tpu.textures import texture_value

    emit_rgb = texture_value(scene, scene.mat_texture[mat_id], rec.uv, rec.point)
    emit_hit = alive & rec.hit & is_emissive
    radiance = radiance + jnp.where(emit_hit[:, None], throughput * emit_rgb, 0.0)

    # Hit -> scatter + RR (camera.rs:298-304, 280-293).
    attenuation, new_dir = materials.scatter(scene, rec, dirn, bounce_key, cfg.compat)
    p = jnp.clip(jnp.max(attenuation, axis=-1), 0.0, cfg.compat.rr_clamp)
    if cfg.detach_sampling:
        p = jax.lax.stop_gradient(p)
    u = jax.random.uniform(jax.random.fold_in(bounce_key, 0x52), p.shape, jnp.float32)
    survive = u < p  # gen_bool(p) equivalent
    can_continue = depth < cfg.max_depth  # camera.rs:300
    cont = alive & rec.hit & survive & can_continue & ~is_emissive

    throughput = jnp.where(
        cont[:, None], throughput * attenuation / jnp.maximum(p, 1e-12)[:, None], throughput
    )

    # Scale-aware origin offset along the outgoing side of the surface.
    point_scale = jnp.maximum(jnp.max(jnp.abs(rec.point), axis=-1, keepdims=True), 1.0)
    side = jnp.sign(jnp.sum(new_dir * rec.normal, axis=-1, keepdims=True))
    new_org = rec.point + cfg.origin_offset * point_scale * side * rec.normal

    org = jnp.where(cont[:, None], new_org, org)
    dirn = jnp.where(cont[:, None], new_dir, dirn)
    return org, dirn, throughput, radiance, cont


def trace_radiance(
    scene: SceneData,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Forward radiance for a ray megabatch: f32[N,3].

    Bounded ``lax.while_loop`` over bounces with early exit once every ray
    has retired — the device-friendly replacement for the reference's
    recursion (camera.rs:296-313).  Forward-only (not differentiable);
    gradients use :func:`trace_radiance_diff`.
    """
    n = origins.shape[0]
    state = (
        origins,
        directions,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool),
    )

    def cond(carry):
        depth, state = carry
        return (depth <= cfg.max_depth) & jnp.any(state[4])

    def body(carry):
        depth, state = carry
        bounce_key = jax.random.fold_in(key, depth)
        return depth + 1, _bounce_step(scene, cfg, state, bounce_key, depth)

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state[3]


def trace_radiance_diff(
    scene: SceneData,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Differentiable radiance: fixed ``cfg.diff_max_depth``-length
    ``lax.scan`` (reverse-mode AD needs a static trip count), each bounce
    rematerialized (``jax.checkpoint``) so residual memory stays O(state)
    instead of O(state * bounces).

    Discrete events (hit ids, RR survival, reflect-vs-refract) follow the
    detached-sampling / path-replay convention: decisions are made with
    stop_gradient'd quantities while the continuous factors (attenuation,
    sky params, refraction directions) carry gradients.
    """
    n = origins.shape[0]
    init = (
        origins,
        directions,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool),
    )
    diff_cfg = cfg.replace(max_depth=cfg.diff_max_depth)

    @jax.checkpoint
    def step(state, depth):
        bounce_key = jax.random.fold_in(key, depth)
        return _bounce_step(scene, diff_cfg, state, bounce_key, depth), None

    state, _ = jax.lax.scan(step, init, jnp.arange(cfg.diff_max_depth + 1))
    return state[3]
