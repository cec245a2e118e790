import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.core import rng, samplers, vecmath as vm


# ---------------------------------------------------------------- RNG parity
def _tea_ref(v0, v1, backoff=16):
    """Scalar python reimplementation of the TEA hash for cross-checking."""
    M = 0xFFFFFFFF
    s0 = 0
    for _ in range(backoff):
        s0 = (s0 + 0x9E3779B9) & M
        v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) ^ ((v1 + s0) & M) ^ (((v1 >> 5) + 0xC8013EA4) & M))) & M
        v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) ^ ((v0 + s0) & M) ^ (((v0 >> 5) + 0x7E95761E) & M))) & M
    return v0


def _lcg_ref(s):
    s = (1664525 * s + 1013904223) & 0xFFFFFFFF
    return s, (s & 0x00FFFFFF) / float(0x01000000)


def test_tea_init_matches_scalar_reference():
    v0s = np.array([0, 1, 12345, 2**31, 719 * 1280 + 640], dtype=np.uint32)
    v1s = np.array([0, 7, 100, 42, 9999], dtype=np.uint32)
    got = np.asarray(rng.tea_init(jnp.asarray(v0s), jnp.asarray(v1s)))
    want = np.array([_tea_ref(int(a), int(b)) for a, b in zip(v0s, v1s)], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_next_rand_matches_lcg_sequence():
    seed = rng.tea_init(jnp.uint32(17), jnp.uint32(3))
    s_ref = int(np.asarray(seed))
    s = seed
    for _ in range(10):
        s, u = rng.next_rand(s)
        s_ref, u_ref = _lcg_ref(s_ref)
        assert int(np.asarray(s)) == s_ref
        assert float(np.asarray(u)) == pytest.approx(u_ref, abs=0)


def test_pixel_seeds_shape_and_determinism():
    a = rng.pixel_seeds(8, 4, 5)
    b = rng.pixel_seeds(8, 4, 5)
    c = rng.pixel_seeds(8, 4, 6)
    assert a.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


# ---------------------------------------------------------------- vec math
def test_dot_cross_normalize():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[4.0, -5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vm.dot(a, b)), [12.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vm.cross(a, b)[0]), np.cross([1, 2, 3], [4, -5, 6]), rtol=1e-6
    )
    n = vm.normalize(a)
    np.testing.assert_allclose(np.asarray(vm.length(n)), [1.0, 1.0], rtol=1e-6)


def test_perpendicular_is_perpendicular():
    dirs = jnp.asarray(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.3, -0.9, 0.1], [-0.5, 0.5, 0.7]]
    )
    p = vm.get_perpendicular(dirs)
    np.testing.assert_allclose(np.asarray(vm.dot(dirs, p)), np.zeros(5), atol=1e-6)
    assert np.all(np.asarray(vm.length(p)) > 1e-3)


def test_latlong_roundtrip_poles_and_axes():
    u, v = vm.ws_vector_to_latlong(jnp.asarray([0.0, 1.0, 0.0]))
    assert float(v) == pytest.approx(0.0, abs=1e-6)
    u, v = vm.ws_vector_to_latlong(jnp.asarray([0.0, -1.0, 0.0]))
    assert float(v) == pytest.approx(1.0, abs=1e-6)
    u, v = vm.ws_vector_to_latlong(jnp.asarray([0.0, 0.0, -1.0]))
    assert float(u) == pytest.approx(0.5, abs=1e-6)
    assert float(v) == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------- samplers
def test_cos_hemisphere_distribution():
    n = 40000
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    _, d = samplers.cos_hemisphere_sample(seeds, normal)
    d = np.asarray(d)
    assert np.all(d[:, 2] >= -1e-6)  # in the hemisphere
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert np.mean(d[:, 2]) == pytest.approx(2.0 / 3.0, abs=0.01)


def test_ggx_half_vectors_cluster_around_normal():
    n = 20000
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    _, h_rough = samplers.ggx_microfacet_sample(seeds, jnp.float32(0.9), normal)
    _, h_smooth = samplers.ggx_microfacet_sample(seeds, jnp.float32(0.05), normal)
    assert float(jnp.mean(h_smooth[:, 1])) > float(jnp.mean(h_rough[:, 1]))
    assert float(jnp.mean(h_smooth[:, 1])) > 0.99


def test_unit_sphere_sample_in_ball():
    n = 5000
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(2))
    _, p = samplers.unit_sphere_sample(seeds)
    r = np.linalg.norm(np.asarray(p), axis=-1)
    assert np.all(r <= 1.0 + 1e-6)
    # mean radius of uniform ball = 3/4
    assert np.mean(r) == pytest.approx(0.75, abs=0.02)


def test_msaa8_jitter_cycles():
    j0 = np.asarray(samplers.msaa8_jitter(0))
    j8 = np.asarray(samplers.msaa8_jitter(8))
    np.testing.assert_array_equal(j0, j8)
    np.testing.assert_allclose(j0, [1 * 0.0625, -3 * 0.0625])


def test_halton_low_discrepancy_range():
    idx = jnp.arange(1, 100)
    h2 = np.asarray(samplers.halton(idx, 2))
    assert np.all((h2 >= 0) & (h2 < 1))
    assert abs(np.mean(h2) - 0.5) < 0.03
