"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.parallel import sharding


@pytest.fixture(scope="module")
def n_dev():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    return n


def test_mesh_creation(n_dev):
    mesh = sharding.make_mesh(n_dev)
    assert mesh.devices.size == n_dev
    assert mesh.axis_names == (sharding.ROW_AXIS,)


def test_shard_image_tree(n_dev):
    mesh = sharding.make_mesh(n_dev)
    h = n_dev * 4
    tree = {"img": jnp.zeros((h, 16, 4)), "scalar": jnp.zeros(())}
    placed = sharding.shard_image_tree(tree, mesh, h)
    assert len(placed["img"].sharding.device_set) == n_dev
    assert len(placed["scalar"].sharding.device_set) == n_dev  # replicated


def test_sharded_render_matches_single_device(n_dev):
    """The row-sharded render step must produce the SAME image as the
    unsharded one (splat psum included)."""
    import functools

    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT, GBUF_FRAME_INIT, render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import RenderConfig

    h = n_dev * 6
    w = 48
    cfg = RenderConfig(width=w, height=h)
    baked = Scene.from_built(cornell_box(), aspect=w / h).bake()
    fn = functools.partial(render_frame_fn, cfg=cfg)
    args = (
        baked, baked.data.camera,
        AccumState.create(h, w), BMFRState.create(h, w),
        jnp.uint32(GBUF_FRAME_INIT), jnp.uint32(BDPT_FRAME_INIT),
        jnp.asarray(False),
    )
    ch_ref, _, _ = jax.jit(fn)(*args)

    mesh = sharding.make_mesh(n_dev)
    step = sharding.sharded_render_step(fn, mesh, h)
    ch_sh, _, _ = step(*args)
    np.testing.assert_allclose(
        np.asarray(ch_ref["PipelineOutput"]),
        np.asarray(ch_sh["PipelineOutput"]),
        atol=2e-5,
    )


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    ch, accum, bmfr = jax.jit(fn)(*args)
    out = np.asarray(ch["PipelineOutput"])
    assert np.isfinite(out).all()


def test_graft_entry_multichip(n_dev):
    import __graft_entry__ as g

    g.dryrun_multichip(n_dev)


def test_sharded_megakernel_matches_single(n_dev):
    """shard_map megakernel step (interpret mode per shard) must reproduce
    the single-chip megakernel frame: global-pixel RNG seeds + psum splat."""
    import functools

    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT, GBUF_FRAME_INIT, render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig, RenderConfig,
    )

    h = n_dev * 16  # 16*128 px/shard: exercises intra-shard padding
    w = 128
    cfg = RenderConfig(width=w, height=h, bdpt=BDPTConfig(megakernel="on"))
    baked = Scene.from_built(cornell_box(), aspect=w / h).bake()
    args = (
        baked, baked.data.camera,
        AccumState.create(h, w), BMFRState.create(h, w),
        jnp.uint32(GBUF_FRAME_INIT), jnp.uint32(BDPT_FRAME_INIT),
        jnp.asarray(False),
    )
    fn = functools.partial(render_frame_fn, cfg=cfg)
    ch_ref, accum_ref, _ = jax.jit(fn)(*args)

    mesh = sharding.make_mesh(n_dev)
    step = sharding.sharded_megakernel_step(cfg, mesh, interpret=True)
    ch_sh, accum_sh, _ = step(*args)
    np.testing.assert_allclose(
        np.asarray(ch_ref["PipelineOutput"]),
        np.asarray(ch_sh["PipelineOutput"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ch_ref["WorldNormal"]), np.asarray(ch_sh["WorldNormal"]),
        atol=2e-5,
    )
    assert float(accum_sh.count) == float(accum_ref.count)


def test_sharded_megakernel_rejects_bmfr(n_dev):
    """BMFR reprojection taps cross shard rows; the megakernel step must
    fail loudly instead of silently denoising with wrong history."""
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig, BMFRConfig, RenderConfig,
    )

    cfg = RenderConfig(
        width=128, height=n_dev * 16,
        bdpt=BDPTConfig(megakernel="on"), bmfr=BMFRConfig(enabled=True),
    )
    mesh = sharding.make_mesh(n_dev)
    with pytest.raises(ValueError, match="BMFR"):
        sharding.sharded_megakernel_step(cfg, mesh, interpret=True)


def test_sharded_wavefront_matches_single(n_dev):
    """shard_map wavefront step (Pallas-capable path) must reproduce the
    single-chip wavefront frame: global-pixel RNG seeds, global estimator-2
    pixel projection, psum splat."""
    import functools

    from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
    from fyp_bidirectionalpathtracer_tpu.pipeline.renderer import (
        BDPT_FRAME_INIT, GBUF_FRAME_INIT, render_frame_fn,
    )
    from fyp_bidirectionalpathtracer_tpu.passes.accumulate import AccumState
    from fyp_bidirectionalpathtracer_tpu.passes.bmfr import BMFRState
    from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BDPTConfig, RenderConfig,
    )

    h = n_dev * 6
    w = 48
    cfg = RenderConfig(width=w, height=h, bdpt=BDPTConfig(megakernel="off"))
    baked = Scene.from_built(cornell_box(), aspect=w / h).bake()
    args = (
        baked, baked.data.camera,
        AccumState.create(h, w), BMFRState.create(h, w),
        jnp.uint32(GBUF_FRAME_INIT), jnp.uint32(BDPT_FRAME_INIT),
        jnp.asarray(False),
    )
    fn = functools.partial(render_frame_fn, cfg=cfg)
    ch_ref, accum_ref, _ = jax.jit(fn)(*args)

    mesh = sharding.make_mesh(n_dev)
    step = sharding.sharded_wavefront_step(cfg, mesh)
    ch_sh, accum_sh, _ = step(*args)
    np.testing.assert_allclose(
        np.asarray(ch_ref["PipelineOutput"]),
        np.asarray(ch_sh["PipelineOutput"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ch_ref["WorldNormal"]), np.asarray(ch_sh["WorldNormal"]),
        atol=2e-5,
    )
    assert float(accum_sh.count) == float(accum_ref.count)


def test_sharded_wavefront_rejects_bmfr(n_dev):
    from fyp_bidirectionalpathtracer_tpu.utils.config import (
        BMFRConfig, RenderConfig,
    )

    cfg = RenderConfig(
        width=48, height=n_dev * 6, bmfr=BMFRConfig(enabled=True),
    )
    mesh = sharding.make_mesh(n_dev)
    with pytest.raises(ValueError, match="BMFR"):
        sharding.sharded_wavefront_step(cfg, mesh)
