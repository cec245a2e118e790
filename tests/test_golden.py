"""Golden-image + statistical regression tests (SURVEY.md §4 strategy)."""
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import Renderer
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
from fyp_bidirectionalpathtracer_tpu.utils.config import BDPTConfig, RenderConfig
from fyp_bidirectionalpathtracer_tpu.utils.image import psnr
from fyp_bidirectionalpathtracer_tpu.utils.testing import golden_compare

SIZE = 64


@pytest.fixture(scope="module")
def baked():
    return Scene.from_built(cornell_box(), aspect=1.0).bake()


def test_golden_cornell_bdpt(baked):
    r = Renderer(baked, RenderConfig(width=SIZE, height=SIZE))
    r.render(8)
    golden_compare("cornell_bdpt_8f_64", r.display())


def test_golden_cornell_depth1(baked):
    cfg = RenderConfig(width=SIZE, height=SIZE, bdpt=BDPTConfig(max_depth=1))
    r = Renderer(baked, cfg)
    r.render(4)
    golden_compare("cornell_depth1_4f_64", r.display())


def test_golden_lambertian_model(baked):
    cfg = RenderConfig(width=SIZE, height=SIZE, bdpt=BDPTConfig(mat_model=1))
    r = Renderer(baked, cfg)
    r.render(4)
    golden_compare("cornell_lambertian_4f_64", r.display())


def test_faithful_rng_mode_renders(baked):
    cfg = RenderConfig(
        width=SIZE, height=SIZE, bdpt=BDPTConfig(faithful_rng=True)
    )
    r = Renderer(baked, cfg)
    out = np.asarray(r.render(4))
    assert np.isfinite(out).all()
    golden_compare("cornell_faithful_rng_4f_64", r.display())


@pytest.mark.slow
def test_convergence_toward_high_spp(baked):
    """More accumulated frames -> closer to a high-spp self-reference."""
    cfg = RenderConfig(width=SIZE, height=SIZE)
    r_ref = Renderer(baked, cfg)
    r_ref.render(64)
    ref = np.asarray(r_ref.channels["Accumulated"])[..., :3]

    r = Renderer(baked, cfg)
    r.render(4)
    p4 = psnr(np.asarray(r.channels["Accumulated"])[..., :3], ref)
    r.render(28)
    p32 = psnr(np.asarray(r.channels["Accumulated"])[..., :3], ref)
    assert p32 > p4  # converging
    assert p32 > 25.0


def test_golden_with_bmfr_denoise(baked):
    """Full pipeline with the denoiser enabled (regression stage on)."""
    cfg = RenderConfig(width=SIZE, height=SIZE)
    cfg = cfg.with_(
        bmfr=cfg.bmfr.__class__(enabled=True, regression=True)
    )
    r = Renderer(baked, cfg)
    r.render(6)
    out = np.asarray(r.channels["PipelineOutput"])
    assert np.isfinite(out).all()
    golden_compare("cornell_bmfr_6f_64", r.display())
