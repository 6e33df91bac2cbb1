"""Tag-dispatched texture evaluation on SoA texture tables.

Reference behavior being matched (texture.rs):
- SolidColor (texture.rs:21-41): constant color.
- CheckerTexture (texture.rs:44-74): 3-D checker on floor(point / scale)
  parity; recursive sub-textures (rt_tpu supports one level — checker
  children must be leaves, which covers every reference scene).
- ImageTexture (texture.rs:99-119): UV clamped to [0,1], nearest-neighbor
  fetch with truncation (x = trunc(u * (w-1))), no filtering, no wrap, and
  no v-flip.

The enum dispatch (texture.rs:12-18) becomes integer tags + masked selects:
every ray evaluates the cheap paths and a ``jnp.where`` picks the result —
branchless, fully vectorized, differentiable w.r.t. ``tex_color`` and the
atlas texels.
"""

from __future__ import annotations

import jax.numpy as jnp

from rt_tpu.scene import SceneData, TEX_CHECKER, TEX_IMAGE


def texture_value(scene: SceneData, tex_id: jnp.ndarray, uv: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Evaluate texture ``tex_id`` i32[N] at (uv f32[N,2], point f32[N,3]).

    Returns linear color f32[N,3].
    """
    tex_id = jnp.clip(tex_id, 0, scene.tex_kind.shape[0] - 1)
    kind = scene.tex_kind[tex_id]

    # Checker resolution (texture.rs:62-73): parity of summed floored cells.
    inv_scale = scene.tex_inv_scale[tex_id]
    cells = jnp.floor(inv_scale[:, None] * point).astype(jnp.int32)
    is_even = jnp.mod(jnp.sum(cells, axis=-1), 2) == 0
    children = scene.tex_children[tex_id]
    child = jnp.where(is_even, children[:, 0], children[:, 1])
    leaf_id = jnp.where(kind == TEX_CHECKER, child, tex_id)
    leaf_id = jnp.clip(leaf_id, 0, scene.tex_kind.shape[0] - 1)
    leaf_kind = scene.tex_kind[leaf_id]

    solid = scene.tex_color[leaf_id]

    # Image fetch (texture.rs:107-118): clamp UV, truncate to texel.
    rect = scene.tex_rect[leaf_id]  # (x0, y0, w, h)
    u = jnp.clip(uv[:, 0], 0.0, 1.0)
    v = jnp.clip(uv[:, 1], 0.0, 1.0)
    w = jnp.maximum(rect[:, 2], 1)
    h = jnp.maximum(rect[:, 3], 1)
    x = (u * (w - 1).astype(jnp.float32)).astype(jnp.int32)
    y = (v * (h - 1).astype(jnp.float32)).astype(jnp.int32)
    ax = jnp.clip(rect[:, 0] + x, 0, scene.atlas.shape[1] - 1)
    ay = jnp.clip(rect[:, 1] + y, 0, scene.atlas.shape[0] - 1)
    image = scene.atlas[ay, ax]

    return jnp.where((leaf_kind == TEX_IMAGE)[:, None], image, solid)
