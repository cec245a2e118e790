"""Analytic light evaluation and construction (Lights.slang:62-100 semantics).

eval_light computes, for every shading point, the (direction, intensity,
distance, light position) tuple of the selected light — the jnp analogue of
evalPointLight / evalDirectionalLight dispatched by getLightData
(MaterialUtils.hlsli:67-85).  Lights live in a fixed-capacity SoA table
(scene.types.LightArray) so per-ray light selection is a gather, not a
branch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.vecmath import dot, saturate
from .types import DEFAULT_MAX_LIGHTS, LIGHT_DIRECTIONAL, LIGHT_POINT, LightArray


def make_light_array(lights: list[dict], capacity: int | None = None) -> LightArray:
    """Bake a list of light dicts into a fixed-capacity LightArray.

    Each dict: {type: 'point'|'dir', pos, dir, intensity, opening_angle?,
    penumbra_angle?}.
    """
    n = len(lights)
    cap = capacity or max(DEFAULT_MAX_LIGHTS, n)
    pos = np.zeros((cap, 3), np.float32)
    dirw = np.tile(np.asarray([0.0, -1.0, 0.0], np.float32), (cap, 1))
    inten = np.zeros((cap, 3), np.float32)
    typ = np.zeros(cap, np.int32)
    opening = np.full(cap, np.pi, np.float32)
    penumbra = np.zeros(cap, np.float32)
    for i, l in enumerate(lights):
        kind = l.get("type", "point")
        typ[i] = LIGHT_DIRECTIONAL if kind in ("dir", "dir_light", "directional") else LIGHT_POINT
        pos[i] = np.asarray(l.get("pos", (0, 0, 0)), np.float32)
        d = np.asarray(l.get("dir", (0, -1, 0)), np.float32)
        nrm = np.linalg.norm(d)
        dirw[i] = d / nrm if nrm > 0 else d
        inten[i] = np.asarray(l.get("intensity", (1, 1, 1)), np.float32)
        opening[i] = np.float32(l.get("opening_angle", np.pi))
        penumbra[i] = np.float32(l.get("penumbra_angle", 0.0))
    return LightArray(
        pos_w=jnp.asarray(pos),
        dir_w=jnp.asarray(dirw),
        intensity=jnp.asarray(inten),
        type=jnp.asarray(typ),
        opening_angle=jnp.asarray(opening),
        cos_opening_angle=jnp.asarray(np.cos(opening)),
        penumbra_angle=jnp.asarray(penumbra),
        count=jnp.asarray(n, jnp.int32),
    )


def eval_light(lights: LightArray, index, surface_pos):
    """Evaluate light `index` ([...] int32) at `surface_pos` ([...,3]).

    Returns (to_light [...,3] normalized, intensity [...,3], dist [...],
    light_pos [...,3]).

    Point lights: inverse-square falloff 1/(0.01^2 + d^2) with spot cutoff
    (Lights.slang:74-100).  Directional: constant intensity, L = -dirW, and a
    pseudo position surfacePos - dirW*|surfacePos - lightPos| so shadow rays
    get a finite distance (Lights.slang:62-71 + getLightData's
    length(ls.posW - hitPos)).
    """
    from ..ops.lookup import table_lookup

    # single packed-row lookup (one-hot matmul for small tables)
    pack = jnp.concatenate(
        [
            lights.pos_w,                                   # 0:3
            lights.dir_w,                                   # 3:6
            lights.intensity,                               # 6:9
            lights.type.astype(jnp.float32)[:, None],       # 9
            lights.cos_opening_angle[:, None],              # 10
            lights.opening_angle[:, None],                  # 11
            lights.penumbra_angle[:, None],                 # 12
        ],
        axis=-1,
    )
    row = table_lookup(pack, index)
    lpos = row[..., 0:3]
    ldir = row[..., 3:6]
    linten = row[..., 6:9]
    ltype = row[..., 9].astype(jnp.int32)
    cos_open = row[..., 10]
    opening = row[..., 11]
    penumbra = row[..., 12]

    # ---- point (spot) light ----
    to_l = lpos - surface_pos
    dist_sq = dot(to_l, to_l)
    valid = dist_sq > 1e-5
    dist_pt = jnp.where(valid, jnp.sqrt(jnp.maximum(dist_sq, 1e-20)), 0.0)
    l_pt = jnp.where(valid[..., None], to_l / jnp.maximum(dist_pt, 1e-20)[..., None], 0.0)
    falloff = 1.0 / (0.0001 + dist_sq)
    cos_theta = -dot(l_pt, ldir)
    falloff = jnp.where(cos_theta < cos_open, 0.0, falloff)
    pen_scale = saturate(
        ((opening - jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))) - penumbra)
        / jnp.maximum(penumbra, 1e-9)
    )
    falloff = jnp.where(penumbra > 0, falloff * pen_scale, falloff)
    inten_pt = linten * falloff[..., None]

    # ---- directional light ----
    l_dir = -ldir
    dist_dir = jnp.sqrt(jnp.maximum(dot(surface_pos - lpos, surface_pos - lpos), 0.0))
    pos_dir = surface_pos - ldir * dist_dir[..., None]

    is_dir = (ltype == LIGHT_DIRECTIONAL)[..., None]
    to_light = jnp.where(is_dir, l_dir, l_pt)
    intensity = jnp.where(is_dir, linten, inten_pt)
    light_pos = jnp.where(is_dir, pos_dir, jnp.broadcast_to(lpos, surface_pos.shape))
    dist = jnp.sqrt(jnp.maximum(dot(light_pos - surface_pos, light_pos - surface_pos), 0.0))
    return to_light, intensity, dist, light_pos
