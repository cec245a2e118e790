"""Multi-chip tiled rendering via jax.sharding (no reference equivalent —
the reference is single-GPU; SURVEY.md §2.5 maps its DispatchRays grid to
this).

Strategy: rendering is embarrassingly parallel over pixels, so the image grid
[H, W] shards by rows over a 1-D device mesh ('rows').  Scene arrays (BVH,
triangles, materials, lights, textures) replicate — they are read-only
gather sources.  The one cross-chip interaction is estimator 2's light-
tracing splat (BDPTMain.rt.hlsl:199 writes arbitrary pixels): each shard
scatters into a full-size splat buffer and XLA reduces it across the mesh —
the scatter-add lowers to a psum over ICI, exactly the collective SURVEY.md
§2.5 calls for.  Accumulation/BMFR history shards by rows with the image.

Everything goes through jit + NamedSharding annotations: XLA's SPMD
partitioner inserts the collectives; we only lay out the data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (row) axis of image-shaped arrays."""
    return NamedSharding(mesh, P(ROW_AXIS))


def shard_image_tree(tree, mesh: Mesh, height: int):
    """device_put a pytree: arrays whose leading dim == height shard by rows,
    everything else replicates."""
    rep = replicated(mesh)
    rows = row_sharded(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 2 and x.shape[0] == height:
            return jax.device_put(x, rows)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def sharded_render_step(frame_fn, mesh: Mesh, height: int):
    """Wrap a whole-frame function so its image-shaped inputs/outputs shard
    by rows.  frame_fn signature matches pipeline.renderer.render_frame_fn
    (already partial-ed over cfg)."""
    rows = row_sharded(mesh)

    def spec_for(tree):
        def leaf(x):
            if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 2 and x.shape[0] == height:
                return rows
            return replicated(mesh)
        return jax.tree_util.tree_map(leaf, tree)

    from ..accel import traverse as traverse_mod

    def traced(*args):
        # Pallas custom-calls can't be SPMD-partitioned; trace the sharded
        # step with the jnp intersectors (each row-shard is an independent
        # wavefront, so nothing is lost except the single-chip kernels).
        prev = traverse_mod.PALLAS_ENABLED
        traverse_mod.PALLAS_ENABLED = False
        try:
            return frame_fn(*args)
        finally:
            traverse_mod.PALLAS_ENABLED = prev

    jitted = jax.jit(traced)

    def step(baked, camera, accum, bmfr_state, gbuf_frame, bdpt_frame, reset):
        baked = replicate_tree(baked, mesh)
        camera = replicate_tree(camera, mesh)
        accum = shard_image_tree(accum, mesh, height)
        bmfr_state = shard_image_tree(bmfr_state, mesh, height)
        return jitted(baked, camera, accum, bmfr_state, gbuf_frame, bdpt_frame, reset)

    return step
