"""Statistical Monte-Carlo hygiene tests (SURVEY.md §4 strategy: pdf
chi-square consistency, energy conservation, estimator sanity)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.core import rng
from fyp_bidirectionalpathtracer_tpu.ops import materials


def _spherical_bins(dirs, n_theta=8, n_phi=8):
    theta = np.arccos(np.clip(dirs[:, 2], -1, 1))
    phi = np.arctan2(dirs[:, 1], dirs[:, 0]) % (2 * np.pi)
    ti = np.clip((theta / (np.pi / 2) * n_theta).astype(int), 0, n_theta - 1)
    pi_ = np.clip((phi / (2 * np.pi) * n_phi).astype(int), 0, n_phi - 1)
    return ti * n_phi + pi_, n_theta, n_phi


def test_ggx_sample_pdf_chi2_consistency():
    """Histogram of sampleBRDF directions must match evalPdf integrated over
    the same bins (validates that the sampler and its pdf agree)."""
    n = 200_000
    seeds = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(99))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    v = jnp.broadcast_to(jnp.asarray([0.3, 0.0, jnp.sqrt(1 - 0.09)]), (n, 3))
    dif = jnp.broadcast_to(jnp.asarray([0.4, 0.4, 0.4]), (n, 3))
    spec = jnp.broadcast_to(jnp.asarray([0.4, 0.4, 0.4]), (n, 3))
    rough = jnp.full((n,), 0.3)
    _, w, l, pdf, is_spec = materials.sample_ggx_brdf(seeds, normal, normal, v, dif, spec, rough)
    l_np = np.asarray(l)
    pdf_np = np.asarray(pdf)
    keep = pdf_np > 1e-6
    l_np, pdf_np = l_np[keep], pdf_np[keep]

    bins, n_theta, n_phi = _spherical_bins(l_np)
    counts = np.bincount(bins, minlength=n_theta * n_phi).astype(np.float64)
    # expected per-bin probability via the pdf importance identity:
    # E[1_bin] = ∫_bin pdf dω  ≈ (1/N) Σ_samples 1_bin (trivially true), so
    # instead validate with an independent pdf estimate: for each bin, the
    # MONTE CARLO estimate of ∫_bin pdf dω using uniform hemisphere samples.
    m = 400_000
    rs = np.random.RandomState(1)
    z = rs.uniform(0, 1, m)
    phi_u = rs.uniform(0, 2 * np.pi, m)
    r = np.sqrt(1 - z * z)
    u_dirs = np.stack([r * np.cos(phi_u), r * np.sin(phi_u), z], -1)
    u_bins, _, _ = _spherical_bins(u_dirs)
    pdf_u = np.asarray(
        materials.eval_ggx_pdf(
            jnp.asarray(np.broadcast_to(np.asarray(v[0]), (m, 3))),
            jnp.asarray(u_dirs.astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.0, 0.0, 1.0], (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.0, 0.0, 1.0], (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.4] * 3, (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.4] * 3, (m, 3)).astype(np.float32)),
            jnp.full((m,), 0.3, jnp.float32),
            jnp.zeros((m,), bool),
        )
    )
    # mixture pdf = p_diff*pdf_diff + p_spec*pdf_spec; eval_ggx_pdf gives the
    # component by is_specular flag -> build the mixture explicitly
    pdf_u_spec = np.asarray(
        materials.eval_ggx_pdf(
            jnp.asarray(np.broadcast_to(np.asarray(v[0]), (m, 3))),
            jnp.asarray(u_dirs.astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.0, 0.0, 1.0], (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.0, 0.0, 1.0], (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.4] * 3, (m, 3)).astype(np.float32)),
            jnp.asarray(np.broadcast_to([0.4] * 3, (m, 3)).astype(np.float32)),
            jnp.full((m,), 0.3, jnp.float32),
            jnp.ones((m,), bool),
        )
    )
    # NOTE eval_ggx_pdf already multiplies by the lobe-choice probability
    mix = pdf_u + pdf_u_spec
    # ∫_bin pdf dω ≈ (2π/m_total) Σ_{u in bin} pdf(u)  (uniform hemisphere,
    # density 1/(2π))
    expected = np.zeros(n_theta * n_phi)
    np.add.at(expected, u_bins, mix * (2 * np.pi / m))
    expected = expected / max(expected.sum(), 1e-9)

    observed = counts / counts.sum()
    big = expected > 0.005
    rel = np.abs(observed[big] - expected[big]) / expected[big]
    assert rel.max() < 0.15, f"max relative bin error {rel.max():.3f}"


def test_bdpt_estimator_unbiased_direct_lighting():
    """Depth-1 BDPT (estimator 1 only, no clamping) must converge to the
    analytic direct lighting of an unoccluded lambertian plane."""
    from fyp_bidirectionalpathtracer_tpu.models.procedural import MaterialDesc, quad
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import Renderer
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig

    scene = Scene(
        meshes=[quad((-10, 0, -10), (-10, 0, 10), (10, 0, 10), (10, 0, -10), 0)],
        materials=[MaterialDesc(base_color=(0.5, 0.5, 0.5, 1.0))],
        lights=[{"type": "point", "pos": (0.0, 2.0, 0.0), "intensity": (10, 10, 10)}],
    )
    scene.camera = None
    scene.apply_default_fixups()
    from fyp_bidirectionalpathtracer_tpu.scene.camera import make_camera

    scene.camera = make_camera(pos=(0, 1.0, -2.0), target=(0, 0, 0.4), aspect=1.0)
    baked = scene.bake()
    cfg = RenderConfig(
        width=48, height=48,
        bdpt=BDPTConfig(max_depth=1, mat_model=1, clamp_upper=1e9,
                        enable_light_tracing=False, enable_connections=False),
    )
    r = Renderer(baked, cfg)
    r.render(128)
    img = np.asarray(r.channels["Accumulated"])
    pos = np.asarray(r.channels["WorldPosition"])
    valid = pos[..., 3] != 0
    # analytic: L = I/(0.0001+d^2) * cos(theta) * albedo/pi, estimator /= 2
    p = pos[valid][:, :3]
    to_l = np.asarray([0, 2, 0]) - p
    d2 = (to_l ** 2).sum(-1)
    cos = to_l[:, 1] / np.sqrt(d2)
    analytic = 10.0 / (1e-4 + d2) * cos * 0.5 / np.pi / 2.0  # /(i+2)=2
    got = img[valid][:, 0]
    rel = np.abs(got - analytic) / np.maximum(analytic, 1e-3)
    assert np.median(rel) < 0.05, f"median rel err {np.median(rel):.3f}"
