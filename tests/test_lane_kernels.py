"""Equivalence tests for the ray-in-lanes production kernels
(accel/pallas_lane.py) against the brute-force reference (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.accel import pallas_lane as lane
from fyp_bidirectionalpathtracer_tpu.accel.pallas_shaded import (
    intersect_shaded,
    pack_shaded_triangles,
)
from fyp_bidirectionalpathtracer_tpu.accel.traverse import intersect_brute
from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene


@pytest.fixture(scope="module")
def cornell():
    return Scene.from_built(cornell_box()).bake()


def _rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(0.05, 0.95, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def test_occluded_lanes_matches_brute(cornell):
    o, d = _rays(600)
    tmax = jnp.full((600,), 0.4)
    occ = lane.occluded_lanes(cornell.tris, o, d, 1e-3, t_max=tmax)
    hb = intersect_brute(cornell.tris, o, d, 1e-3, t_max=tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hb.hit))


def test_shaded_lanes_matches_pair_tile_kernel(cornell):
    o, d = _rays(600, seed=2)
    sp = pack_shaded_triangles(cornell.tris, cornell.data.materials)
    lp = lane.pack_shaded_tris_lane(cornell.tris, cornell.data.materials)
    h0, f0 = intersect_shaded(cornell.tris, sp, o, d, 1e-3)
    h1, f1 = lane.intersect_shaded_lanes(cornell.tris, lp, o, d, 1e-3)
    tri0, tri1 = np.asarray(h0.tri), np.asarray(h1.tri)
    t0, t1 = np.asarray(h0.t), np.asarray(h1.t)
    # Edge hits where two triangles land within an ulp of the same t may
    # resolve to either winner depending on op-fusion rounding; require the
    # ids to agree except on such ties.
    differs = tri0 != tri1
    if differs.any():
        np.testing.assert_allclose(t0[differs], t1[differs], rtol=1e-5)
        assert (tri0[differs] >= 0).all() and (tri1[differs] >= 0).all()
    agree = ~differs
    hit = (tri0 >= 0) & agree
    np.testing.assert_allclose(t0[hit], t1[hit], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f0)[hit], np.asarray(f1)[hit], atol=2e-4
    )


def test_shaded_lanes_cull_backface(cornell):
    o, d = _rays(300, seed=3)
    lp = lane.pack_shaded_tris_lane(cornell.tris, cornell.data.materials)
    h_cull, _ = lane.intersect_shaded_lanes(
        cornell.tris, lp, o, d, 1e-3, cull_backface=True
    )
    hb = intersect_brute(cornell.tris, o, d, 1e-3, cull_backface=True)
    np.testing.assert_array_equal(np.asarray(h_cull.tri), np.asarray(hb.tri))
