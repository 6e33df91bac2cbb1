"""Differentiable rendering: parameter pytrees, losses, gradients.

The reference has no gradients of any kind — differentiability is the
north-star addition (BASELINE.json): the forward renderer is a pure
function of scene parameters, so reverse-mode pixel gradients flow to
material albedos/fuzz/IOR, texture arrays (atlas), and sky/sun parameters.

`SceneParams` names exactly the leaves a gradient step may touch;
geometry (sphere centers, triangle vertices) is deliberately excluded —
visibility discontinuities make bare AD gradients w.r.t. geometry biased,
and the reference feature set doesn't need them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rt_tpu.camera import Camera
from rt_tpu.config import RenderConfig
from rt_tpu.render import render_chunk
from rt_tpu.scene import SceneData
from rt_tpu.sky import SkyParams


class SceneParams(NamedTuple):
    """The differentiable subset of SceneData."""

    tex_color: jnp.ndarray
    atlas: jnp.ndarray
    mat_fuzz: jnp.ndarray
    mat_ior: jnp.ndarray
    sky_sun_direction: jnp.ndarray
    sky_turbidity: jnp.ndarray
    sky_exposure: jnp.ndarray


def get_params(scene: SceneData) -> SceneParams:
    return SceneParams(
        tex_color=scene.tex_color,
        atlas=scene.atlas,
        mat_fuzz=scene.mat_fuzz,
        mat_ior=scene.mat_ior,
        sky_sun_direction=scene.sky.sun_direction,
        sky_turbidity=scene.sky.turbidity,
        sky_exposure=scene.sky.exposure,
    )


def set_params(scene: SceneData, p: SceneParams) -> SceneData:
    return scene.replace(
        tex_color=p.tex_color,
        atlas=p.atlas,
        mat_fuzz=p.mat_fuzz,
        mat_ior=p.mat_ior,
        # replace() (not a fresh SkyParams) so non-pytree static fields like
        # cos_gamma_as_angle survive gradient/training steps.
        sky=scene.sky.replace(
            sun_direction=p.sky_sun_direction,
            turbidity=p.sky_turbidity,
            exposure=p.sky_exposure,
        ),
    )


def pixel_loss(
    params: SceneParams,
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    pixel_idx: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    spp: int = 1,
) -> jnp.ndarray:
    """MSE between rendered pixels and ``target`` f32[P,3], differentiable
    w.r.t. ``params`` through the bounce scan."""
    s = set_params(scene, params)
    colors = render_chunk(
        s, camera, pixel_idx, cfg, spp, jnp.int32(0), key, differentiable=True
    )
    return jnp.mean((colors - target) ** 2)


def pixel_grad(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    pixel_idx: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    spp: int = 1,
) -> tuple[jnp.ndarray, SceneParams]:
    """(loss, dloss/dparams) — the "pixel-grad backward pass" the baseline
    metric tracks (BASELINE.json)."""
    loss_fn = lambda p: pixel_loss(p, scene, camera, cfg, pixel_idx, target, key, spp)
    return jax.value_and_grad(loss_fn)(get_params(scene))


def finite_difference_grad(
    loss_fn, params: SceneParams, leaf: str, index: tuple, eps: float = 1e-3
) -> float:
    """Central finite difference of ``loss_fn`` w.r.t. one scalar entry of
    one leaf — the gradient-correctness harness (SURVEY.md §4)."""
    base = getattr(params, leaf)

    def bumped(sign):
        arr = base.at[index].add(sign * eps)
        return params._replace(**{leaf: arr})

    lo = loss_fn(bumped(-1.0))
    hi = loss_fn(bumped(+1.0))
    return float((hi - lo) / (2.0 * eps))
