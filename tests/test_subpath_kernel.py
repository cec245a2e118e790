"""Equivalence test for the experimental subpath megakernel
(accel/pallas_subpath.py) against the production shoot_ray path.

Uses a 2-triangle scene and 2 bounces to keep interpret-mode compile small.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.accel.pallas_shaded import pack_shaded_triangles
from fyp_bidirectionalpathtracer_tpu.accel.pallas_subpath import build_subpath
from fyp_bidirectionalpathtracer_tpu.core import rng
from fyp_bidirectionalpathtracer_tpu.models.procedural import quad
from fyp_bidirectionalpathtracer_tpu.models.procedural import MaterialDesc
from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
from fyp_bidirectionalpathtracer_tpu.passes import bdpt as bdpt_mod
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig


@pytest.mark.parametrize("mat_model", [0, 1])
def test_subpath_kernel_matches_shoot_ray(mat_model):
    floor = quad((-5, 0, -5), (-5, 0, 5), (5, 0, 5), (5, 0, -5), 0)
    scene = Scene(
        meshes=[floor],
        materials=[MaterialDesc(base_color=(0.6, 0.5, 0.4, 1.0),
                                specular=(0.2, 0.2, 0.2, 0.7))],
        lights=[{"type": "point", "pos": (0, 3, 0), "intensity": (5, 5, 5)}],
    )
    baked = scene.bake()
    cfg = BDPTConfig(mat_model=mat_model)
    trace = make_shaded_tracer(baked, force_fused=True)

    n = 64
    rs = np.random.RandomState(0)
    o0 = jnp.asarray(rs.uniform([-2, 1, -2], [2, 3, 2], (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1])  # point downward so most rays hit the floor
    d0 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))
    color0 = jnp.ones((n, 3))
    term0 = jnp.zeros((n,), bool)

    payload = bdpt_mod.init_payload(o0, d0, color0, seeds)
    ref = []
    for _ in range(2):
        was_active = ~payload.terminated
        payload = bdpt_mod.shoot_ray(payload, trace, cfg)
        ref.append((payload.vertex(), was_active))

    tri_pack = pack_shaded_triangles(baked.tris, baked.data.materials)
    verts, final = build_subpath(
        tri_pack, int(baked.tris.v0.shape[0]), o0, d0, color0, seeds, term0,
        cfg.min_t, 2, mat_model, cfg.faithful_rng,
    )

    for b in range(2):
        rv, was_active = ref[b]
        act = np.asarray(was_active)
        kv = verts[b]
        for name, field in (("color", rv.color), ("pos", rv.pos), ("n", rv.n),
                            ("dif", rv.dif), ("spec", rv.spec)):
            a = np.nan_to_num(np.asarray(field)[act], nan=-7.0)
            k = np.nan_to_num(np.asarray(kv[name])[act], nan=-7.0)
            np.testing.assert_allclose(a, k, atol=5e-4, err_msg=f"bounce{b}.{name}")
    np.testing.assert_array_equal(
        np.asarray(payload.terminated), np.asarray(final["terminated"])
    )
    np.testing.assert_array_equal(
        np.asarray(payload.seed), np.asarray(final["seed"])
    )
