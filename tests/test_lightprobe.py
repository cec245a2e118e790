"""Light-probe pre-integration tests (ops/lightprobe.py vs Falcor
LightProbeIntegration.ps.slang / LightProbe.cpp).

Verification strategy: exact invariants (constant maps are fixed points of
both convolutions), an independent numpy quadrature oracle for the diffuse
cosine convolution, and exact values for the Hammersley sequence.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.ops.lightprobe import (
    hammersley,
    integrate_dfg,
    integrate_diffuse_ld,
    integrate_specular_ld,
    latlong_texel_dirs,
)


def test_hammersley_exact():
    i = jnp.arange(8, dtype=jnp.uint32)
    u, v = hammersley(i, 8)
    np.testing.assert_allclose(np.asarray(u), np.arange(8) / 8)
    np.testing.assert_allclose(
        np.asarray(v), [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])


def test_latlong_dirs_roundtrip():
    from fyp_bidirectionalpathtracer_tpu.core.vecmath import (
        ws_vector_to_latlong,
    )
    h, w = 8, 16
    d = latlong_texel_dirs(h, w)
    u, v = ws_vector_to_latlong(d)
    uu = (np.arange(w) + 0.5) / w
    vv = (np.arange(h) + 0.5) / h
    np.testing.assert_allclose(np.asarray(u), np.tile(uu, (h, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.tile(vv[:, None], (1, w)),
                               atol=1e-5)


def test_diffuse_constant_fixed_point():
    env = jnp.full((8, 16, 3), 0.7, jnp.float32)
    out = integrate_diffuse_ld(env, size=8, sample_count=64)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-5)


def test_specular_constant_fixed_point():
    env = jnp.full((16, 32, 3), 0.4, jnp.float32)
    out = integrate_specular_ld(env, size=8, sample_count=32, mip_count=3)
    assert out.shape == (3, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 0.4, rtol=1e-4)


def test_diffuse_matches_numpy_quadrature():
    """Cosine convolution vs independent numpy quadrature on a smooth env.

    env(theta) = 0.2 + 0.6 * (cos(theta)+1)/2 depends only on latitude, so
    the convolved value at N is a 1D integral the oracle evaluates on a
    dense sphere grid; the Hammersley estimate should land within ~2%."""
    h, w = 16, 32
    v = (np.arange(h) + 0.5) / h
    band = (0.2 + 0.6 * (np.cos(v * np.pi) + 1) / 2).astype(np.float32)
    env = jnp.asarray(np.tile(band[:, None, None], (1, w, 3)))

    size = 8
    out = np.asarray(integrate_diffuse_ld(env, size=size, sample_count=4096))

    # numpy quadrature: for each output N, integrate env(L) cos/pi over the
    # upper hemisphere about N on a dense (theta, phi) grid
    n_dirs = np.asarray(latlong_texel_dirs(size, size)).reshape(-1, 3)
    t = np.linspace(0, np.pi, 256)
    p = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    tt, pp = np.meshgrid(t, p, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.sin(pp), np.cos(tt),
                     -np.sin(tt) * np.cos(pp)], -1)          # same latlong frame
    d_omega = np.sin(tt) * (t[1] - t[0]) * (p[1] - p[0])
    env_l = 0.2 + 0.6 * (dirs[..., 1] + 1) / 2               # cos(theta)=y
    for k in range(0, n_dirs.shape[0], 7):                   # subsample texels
        n = n_dirs[k]
        cos_nl = dirs @ n
        ref = float(np.sum(np.where(cos_nl > 0, env_l * cos_nl, 0.0)
                           * d_omega) / np.pi)
        got = out.reshape(-1, 3)[k, 0]
        assert abs(got - ref) < 0.02 * max(ref, 0.1), (k, got, ref)


def _np_radical_inverse(i):
    bits = np.uint32(i)
    bits = np.uint32((int(bits) << 16) & 0xFFFFFFFF) | (bits >> np.uint32(16))
    b = int(bits)
    b = ((b & 0x55555555) << 1) | ((b & 0xAAAAAAAA) >> 1)
    b = ((b & 0x33333333) << 2) | ((b & 0xCCCCCCCC) >> 2)
    b = ((b & 0x0F0F0F0F) << 4) | ((b & 0xF0F0F0F0) >> 4)
    b = ((b & 0x00FF00FF) << 8) | ((b & 0xFF00FF00) >> 8)
    return (b & 0xFFFFFFFF) * 2.3283064365386963e-10


def _np_dfg_point(n_dot_v, roughness, n_samples):
    """Independent numpy re-derivation of integrateDFG
    (LightProbeIntegration.ps.slang:155-195) for one (NdotV, roughness).
    Note the reference's own quirks, reproduced: L = reflect(-N, H) (about
    N, not V — so the split-sum furnace bound does NOT hold at grazing
    NdotV) and the UE4 k-remapped Smith G."""
    n = np.array([0.0, 0.0, 1.0])
    v = np.array([np.sqrt(max(0.0, 1 - n_dot_v**2)), 0.0, n_dot_v])
    acc = np.zeros(3)
    for i in range(n_samples):
        u1 = i / n_samples
        u2 = _np_radical_inverse(i)
        # importanceSampleGGX about +z (basis: up=(0,0,1)->right=(1,0,0)?
        # generateBasis: up=(1,0,0) when N~=z, right=norm(up x N)=(0,1,0)?
        # up=(1,0,0), N=(0,0,1): up x N = (0*1-0*0, 0*0-1*1, 0) = (0,-1,0)
        # right=(0,-1,0), forward = N x right = (0*0-1*-1, ...) = (1,0,0)
        a = roughness * roughness
        phi = 2 * np.pi * u1
        ct = np.sqrt((1 - u2) / (1 + (a * a - 1) * u2))
        st = np.sqrt(max(0.0, 1 - ct * ct))
        tx, ty = st * np.cos(phi), st * np.sin(phi)
        right = np.array([0.0, -1.0, 0.0])
        forward = np.array([1.0, 0.0, 0.0])
        h = right * tx + forward * ty + n * ct
        h = h / np.linalg.norm(h)
        l = -n - 2 * np.dot(-n, h) * h  # HLSL reflect(-N, H)
        ndl = min(max(np.dot(n, l), 0.0), 1.0)
        ndh = min(max(np.dot(n, h), 0.0), 1.0)
        ldh = min(max(np.dot(l, h), 0.0), 1.0)
        k = (roughness + 1) ** 2 / 8
        g = (ndl / (ndl * (1 - k) + k)) * (n_dot_v / (n_dot_v * (1 - k) + k))
        if ndl > 0 and g > 0:
            gvis = g * ldh / (n_dot_v * ndh)
            fc = (1 - ldh) ** 5
            acc[0] += (1 - fc) * gvis
            acc[1] += fc * gvis
        # Disney diffuse
        u1d, u2d = (u1 + 0.5) % 1.0, (u2 + 0.5) % 1.0
        r = np.sqrt(u1d)
        phi_d = u2d * 2 * np.pi
        lx, ly, lz = r * np.cos(phi_d), r * np.sin(phi_d), np.sqrt(
            max(0.0, 1 - u1d))
        ld = right * ly + forward * lx + n * lz
        ld = ld / np.linalg.norm(ld)
        ndl_d = min(max(np.dot(n, ld), 0.0), 1.0)
        if ndl_d > 0:
            hd = (v + ld) / np.linalg.norm(v + ld)
            ldh_d = min(max(np.dot(ld, hd), 0.0), 1.0)
            fd90 = 0.5 + 2 * ldh_d**2 * np.sqrt(roughness)
            fl = 1 + (fd90 - 1) * (1 - ndl_d) ** 5
            fv = 1 + (fd90 - 1) * (1 - min(max(n_dot_v, 0.0), 1.0)) ** 5
            acc[2] += fl * fv
    return acc / n_samples


def test_dfg_matches_numpy_oracle():
    size, n_samples = 16, 128
    out = np.asarray(integrate_dfg(size=size, sample_count=n_samples))
    assert out.shape == (size, size, 3)
    assert np.all(np.isfinite(out)) and np.all(out >= 0.0)
    for iy, ix in [(0, 8), (8, 4), (15, 15), (4, 12)]:
        roughness = (iy + 0.5) / size
        n_dot_v = (ix + 0.5) / size
        ref = _np_dfg_point(n_dot_v, roughness, n_samples)
        np.testing.assert_allclose(out[iy, ix], ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("cls", ["bundle"])
def test_lightprobe_bundle_shapes(cls):
    from fyp_bidirectionalpathtracer_tpu.ops.lightprobe import LightProbe

    env = jnp.full((8, 16, 3), 0.25, jnp.float32)
    probe = LightProbe(env, diff_samples=16, spec_samples=8, diff_size=4,
                       spec_size=4, spec_mips=2)
    assert probe.diffuse.shape == (4, 4, 3)
    assert probe.specular.shape == (2, 4, 4, 3)
    assert probe.dfg.shape == (128, 128, 3)


def test_eval_probe_constant_env_orientation_invariant():
    """With a constant env the probe maps are constant, so eval_probe
    depends only on (NdotV, roughness, albedo) — rotating the frame must
    not change the result (Lights.slang:155-201 reads only direction
    lookups, which constant maps make orientation-free)."""
    from fyp_bidirectionalpathtracer_tpu.ops.lightprobe import (
        LightProbe,
        eval_probe,
    )

    env = jnp.full((8, 16, 3), 0.6, jnp.float32)
    probe = LightProbe(env, diff_samples=32, spec_samples=16, diff_size=8,
                       spec_size=8, spec_mips=3)
    dif = jnp.full((2, 3), 0.5, jnp.float32)
    spec = jnp.full((2, 3), 0.04, jnp.float32)
    rough = jnp.full((2,), 0.25, jnp.float32)
    c, s = np.cos(0.3), np.sin(0.3)
    n = jnp.asarray([[0.0, 0.0, 1.0], [0.0, s, c]], jnp.float32)
    v = jnp.asarray([[s, 0.0, c], [s * c, -s * s + 0.0, 0.0]], jnp.float32)
    # build the second view dir with the same NdotV by rotating frame 1
    rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    v = jnp.asarray(np.stack([[s, 0.0, c], rot @ np.array([s, 0.0, c])]),
                    jnp.float32)
    out = np.asarray(eval_probe(probe, n, v, dif, spec, rough))
    assert np.all(np.isfinite(out)) and np.all(out >= 0.0)
    # small residual: the 8x8 lat-long maps are constant only to ~5e-4
    # (edge-clamped bilinear taps near the poles)
    np.testing.assert_allclose(out[0], out[1], rtol=2e-3, atol=1e-4)


def test_probe_lit_pass_golden():
    """Consumer golden: Cornell G-buffer shaded with direct + probe IBL
    (passes/extras.probe_lit_pass; reference consumer SceneRenderer ->
    evalMaterial probe overload, Shading.slang:330-340)."""
    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.ops.lightprobe import LightProbe
    from fyp_bidirectionalpathtracer_tpu.ops.tonemap import tone_map
    from fyp_bidirectionalpathtracer_tpu.passes.extras import probe_lit_pass
    from fyp_bidirectionalpathtracer_tpu.passes.gbuffer import (
        pixel_jitter_for_frame,
        ray_traced_gbuffer,
    )
    from fyp_bidirectionalpathtracer_tpu.ops.shading import make_shaded_tracer
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.testing import golden_compare

    baked = Scene.from_built(cornell_box(), aspect=1.0).bake()
    frame = jnp.uint32(0xDEADBEEF)
    jitter = pixel_jitter_for_frame(frame, "msaa8")
    trace = make_shaded_tracer(baked)
    channels = ray_traced_gbuffer(baked, trace, 64, 64, frame, jitter)
    probe = LightProbe(baked.data.env_map, diff_samples=256,
                       spec_samples=64, diff_size=16, spec_size=32,
                       spec_mips=4)
    img = probe_lit_pass(baked, baked.intersector(), channels, probe)
    out = np.asarray(img)
    assert np.all(np.isfinite(out))
    golden_compare("cornell_probe_lit_64", tone_map(jnp.asarray(out[..., :3]), 0))
