"""Tone-mapping operators (Falcor Data/Effects/ToneMapping.ps.slang parity).

Seven operators as in ToneMapping.h:51-59: Clamp (default for the BDPT app,
SimpleToneMappingPass.cpp:39), Linear, Reinhard, ReinhardModified,
HejiHableAlu, HableUc2, Aces.  Exposure uses the shader's key/avg-luminance
model with avg-luminance supplied by the caller (we compute it from the frame
instead of a luminance mip chain).
"""
from __future__ import annotations

import jax.numpy as jnp

CLAMP = 0
LINEAR = 1
REINHARD = 2
REINHARD_MOD = 3
HEJI_HABLE_ALU = 4
HABLE_UC2 = 5
ACES = 6

OPERATOR_NAMES = {
    "clamp": CLAMP,
    "linear": LINEAR,
    "reinhard": REINHARD,
    "reinhard_mod": REINHARD_MOD,
    "heji_hable": HEJI_HABLE_ALU,
    "hable_uc2": HABLE_UC2,
    "aces": ACES,
}


def calc_luminance(c):
    """BT.601 weights, as the shader uses (ToneMapping.ps.slang:43-46)."""
    return 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]


def _reinhard(c):
    lum = calc_luminance(c)
    r = lum / (lum + 1.0)
    return c * (r / lum)[..., None]


def _reinhard_mod(c, max_white):
    lum = calc_luminance(c)
    r = lum * (1.0 + lum / (max_white * max_white)) * (1.0 + lum)
    return c * (r / lum)[..., None]


def _heji_hable(c):
    c = jnp.maximum(0.0, c - 0.004)
    c = (c * (6.2 * c + 0.5)) / (c * (6.2 * c + 1.7) + 0.06)
    return jnp.power(c, 2.2)  # includes sRGB as in the shader


def _uc2_curve(c):
    a, b, cc, d, e, f = 0.22, 0.3, 0.1, 0.2, 0.01, 0.3
    return ((c * (a * c + cc * b) + d * e) / (c * (a * c + b) + d * f)) - e / f


def _hable_uc2(c, white_scale):
    c = _uc2_curve(2.0 * c)
    return c / _uc2_curve(jnp.asarray(white_scale))


def _aces(c):
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def tone_map(
    color,
    operator: int = CLAMP,
    exposure_key: float = 0.042,
    max_white_luminance: float = 1.0,
    white_scale: float = 11.2,
    avg_luminance=None,
):
    """Apply exposure + the selected operator to [...,3] linear color."""
    if operator == CLAMP:
        return jnp.clip(color, 0.0, 1.0)
    if avg_luminance is None:
        lum = calc_luminance(color)
        avg_luminance = jnp.exp(jnp.mean(jnp.log(jnp.maximum(lum, 1e-4))))
    exposed = color * (exposure_key / avg_luminance)
    if operator == LINEAR:
        out = exposed
    elif operator == REINHARD:
        out = _reinhard(exposed)
    elif operator == REINHARD_MOD:
        out = _reinhard_mod(exposed, max_white_luminance)
    elif operator == HEJI_HABLE_ALU:
        out = _heji_hable(exposed)
    elif operator == HABLE_UC2:
        out = _hable_uc2(exposed, white_scale)
    elif operator == ACES:
        out = _aces(exposed)
    else:
        raise ValueError(f"unknown tone-map operator {operator}")
    return jnp.clip(out, 0.0, 1.0)
