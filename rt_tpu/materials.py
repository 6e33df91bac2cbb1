"""Tag-dispatched BSDF scattering on SoA material tables.

Reference behavior being matched (material.rs), math replicated exactly:
- Lambertian (material.rs:110-120): scatter_dir = normal + random_unit,
  with near-zero fallback to the normal; attenuation = texture value.
- Metal (material.rs:94-108): mirror reflection of the *unnormalized*
  incoming direction, plus optional fuzz * random_unit perturbation; NO
  below-horizon re-absorption check (reference has none).
- Dielectric (material.rs:150-179): Schlick reflectance vs uniform noise,
  total-internal-reflection check, optional frosted fuzz on the refracted
  direction, attenuation == (1,1,1), scattered direction normalized.
- reflect/refract helpers (material.rs:46-60), Schlick (material.rs:181-186).

The enum dispatch (material.rs:10-16) becomes integer tags + masked selects:
all three BSDFs are evaluated branchlessly and a ``jnp.where`` on the tag
picks the result.  At three cheap BSDFs this beats sorted material queues
(no sort/scatter traffic); queues become worthwhile only with many
expensive materials.

RNG: the reference draws from ``thread_rng`` per scatter (material.rs:98,
112, 164); rt_tpu draws shaped iid uniforms from a (batch, bounce, purpose)
threefry key — deterministic and replayable for the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt_tpu import sampling
from rt_tpu.config import CompatConfig
from rt_tpu.geometry import HitRecord
from rt_tpu.scene import SceneData, MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC
from rt_tpu.textures import texture_value

# f32 analog of the reference's near-zero test (vec3.rs:105-111,
# sqrt(EPSILON) componentwise).
NEAR_ZERO_EPS = 3.45e-4


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (material.rs:46-51); ``d`` need not be unit."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(unit_d: jnp.ndarray, n: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction (material.rs:53-60); expects unit ``unit_d``,
    ``ratio`` f32[...,1]."""
    cos_theta = jnp.minimum(-jnp.sum(unit_d * n, axis=-1, keepdims=True), 1.0)
    r_out_perp = (unit_d + n * cos_theta) * ratio
    perp_sq = jnp.sum(r_out_perp * r_out_perp, axis=-1, keepdims=True)
    # sqrt is floored at 1e-12: d/dx sqrt(0) = inf would turn the masked-out
    # lanes' zero cotangents into NaNs (0 * inf) under reverse-mode AD.
    r_out_parallel = n * -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - perp_sq), 1.0e-12))
    return r_out_parallel + r_out_perp


def schlick_reflectance(cosine: jnp.ndarray, refractive_index: jnp.ndarray) -> jnp.ndarray:
    """Schlick's approximation (material.rs:181-186)."""
    r0 = (1.0 - refractive_index) / (1.0 + refractive_index)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def scatter(
    scene: SceneData,
    rec: HitRecord,
    dir_in: jnp.ndarray,
    key: jax.Array,
    compat: CompatConfig = CompatConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Scatter::scatter (material.rs:38-44) with batch-keyed draws.

    Args:
      rec: nearest-hit payload (values at missed lanes are ignored by the
        integrator's masks).
      dir_in: f32[N,3] incoming ray directions, unnormalized (reference
        convention).
      key: per-(batch, bounce) key; purposes are folded in below.

    Returns:
      (attenuation f32[N,3], scattered_dir f32[N,3]); the scattered ray
      origin is the hit point (offset applied by the integrator).
    """
    n = dir_in.shape[0]
    u_lam = sampling.random_unit(jax.random.fold_in(key, 1), (n,))
    u_fuzz = sampling.random_unit(jax.random.fold_in(key, 2), (n,))
    noise = jax.random.uniform(jax.random.fold_in(key, 3), (n,), jnp.float32)
    return scatter_with_randoms(scene, rec, dir_in, u_lam, u_fuzz, noise, compat)


def scatter_hashed(
    scene: SceneData,
    rec: HitRecord,
    dir_in: jnp.ndarray,
    seed: int,
    work: jnp.ndarray,
    depth: jnp.ndarray,
    compat: CompatConfig = CompatConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter with hash-RNG draws keyed on (seed, work_id, depth) — the
    wavefront hot path (see rt_tpu/rng.py).  Deterministic per path segment
    regardless of pool layout."""
    from rt_tpu import rng

    u_lam = rng.unit_vector(seed, work, depth, 1)
    u_fuzz = rng.unit_vector(seed, work, depth, 2)
    noise = rng.uniform(seed, work, depth, 9)
    return scatter_with_randoms(scene, rec, dir_in, u_lam, u_fuzz, noise, compat)


def scatter_with_randoms(
    scene: SceneData,
    rec: HitRecord,
    dir_in: jnp.ndarray,
    u_lam: jnp.ndarray,
    u_fuzz: jnp.ndarray,
    noise: jnp.ndarray,
    compat: CompatConfig = CompatConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pure BSDF math given pre-drawn randoms: u_lam/u_fuzz unit f32[N,3]
    (reference-distribution random_unit), noise uniform f32[N]."""
    mat_id = jnp.clip(rec.material, 0, scene.mat_kind.shape[0] - 1)
    kind = scene.mat_kind[mat_id]
    fuzz = scene.mat_fuzz[mat_id]
    ior = scene.mat_ior[mat_id]
    tex_id = scene.mat_texture[mat_id]

    tex_rgb = texture_value(scene, tex_id, rec.uv, rec.point)
    normal = rec.normal

    # Lambertian (material.rs:110-120).
    lam_dir = normal + u_lam
    lam_small = jnp.all(jnp.abs(lam_dir) < NEAR_ZERO_EPS, axis=-1, keepdims=True)
    lam_dir = jnp.where(lam_small, normal, lam_dir)

    # Metal (material.rs:94-108): reflect the raw (unnormalized) direction.
    metal_dir = reflect(dir_in, normal) + fuzz[:, None] * u_fuzz

    # Dielectric (material.rs:150-179).
    ri = jnp.where(rec.front, 1.0 / ior, ior)[:, None]
    unit_d = dir_in / jnp.maximum(
        jnp.linalg.norm(dir_in, axis=-1, keepdims=True), 1.0e-20
    )
    cos_theta = jnp.minimum(-jnp.sum(unit_d * normal, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = ri[:, 0] * sin_theta > 1.0
    reflectance = schlick_reflectance(cos_theta, ri[:, 0])
    choose_reflect = cannot_refract | (reflectance > noise)
    refracted = refract(unit_d, normal, ri) + fuzz[:, None] * u_fuzz
    diel_dir = jnp.where(choose_reflect[:, None], reflect(unit_d, normal), refracted)
    diel_dir = diel_dir / jnp.maximum(
        jnp.linalg.norm(diel_dir, axis=-1, keepdims=True), 1.0e-20
    )

    is_lam = (kind == MAT_LAMBERTIAN)[:, None]
    is_metal = (kind == MAT_METAL)[:, None]
    out_dir = jnp.where(is_lam, lam_dir, jnp.where(is_metal, metal_dir, diel_dir))
    attenuation = jnp.where(
        is_lam | is_metal, tex_rgb, jnp.ones((1, 3), tex_rgb.dtype)
    )
    return attenuation, out_dir
