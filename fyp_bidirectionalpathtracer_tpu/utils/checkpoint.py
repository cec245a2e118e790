"""Render-state checkpoint/resume.

The reference has no training-style checkpointing; its persistent state is
the accumulation buffer + counter and the BMFR history textures (SURVEY.md
§5).  We serialize exactly that (plus frame index and camera pose) so a
progressive render can resume across process restarts — the load-bearing
reset semantics (camera move / resize / option change) live in the passes.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_render_state(path: str, renderer) -> None:
    """Write renderer state to <path>.npz + <path>.json."""
    arrays = {
        "accum_last": np.asarray(renderer.state.accum.last_frame),
        "accum_count": np.asarray(renderer.state.accum.count),
        "bmfr_prev_pos": np.asarray(renderer.state.bmfr.prev_pos),
        "bmfr_prev_norm": np.asarray(renderer.state.bmfr.prev_norm),
        "bmfr_prev_noisy": np.asarray(renderer.state.bmfr.prev_noisy),
        "bmfr_prev_filtered": np.asarray(renderer.state.bmfr.prev_filtered),
        "bmfr_frame_number": np.asarray(renderer.state.bmfr.frame_number),
        "camera_pos": np.asarray(renderer.camera.pos_w),
        "camera_target": np.asarray(renderer.camera.target),
        "camera_up": np.asarray(renderer.camera.up),
        "prev_view_proj": np.asarray(renderer.camera.prev_view_proj),
    }
    np.savez_compressed(path + ".npz", **arrays)
    meta = {
        "frame_index": renderer.state.frame_index,
        "time": renderer.state.time,
        "width": renderer.cfg.width,
        "height": renderer.cfg.height,
    }
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh)


def load_render_state(path: str, renderer) -> None:
    """Restore state saved by save_render_state into a compatible renderer."""
    with open(path + ".json") as fh:
        meta = json.load(fh)
    if (meta["width"], meta["height"]) != (renderer.cfg.width, renderer.cfg.height):
        raise ValueError(
            f"checkpoint resolution {meta['width']}x{meta['height']} != "
            f"renderer {renderer.cfg.width}x{renderer.cfg.height}"
        )
    z = np.load(path + ".npz")
    renderer.state.accum = renderer.state.accum.replace(
        last_frame=jnp.asarray(z["accum_last"]),
        count=jnp.asarray(z["accum_count"]),
    )
    renderer.state.bmfr = renderer.state.bmfr.replace(
        prev_pos=jnp.asarray(z["bmfr_prev_pos"]),
        prev_norm=jnp.asarray(z["bmfr_prev_norm"]),
        prev_noisy=jnp.asarray(z["bmfr_prev_noisy"]),
        prev_filtered=jnp.asarray(z["bmfr_prev_filtered"]),
        frame_number=jnp.asarray(z["bmfr_frame_number"]),
    )
    renderer.state.frame_index = int(meta["frame_index"])
    renderer.state.time = float(meta["time"])
    renderer.set_camera_pose(z["camera_pos"], z["camera_target"], z["camera_up"])
    renderer.camera = renderer.camera.replace(
        prev_view_proj=jnp.asarray(z["prev_view_proj"])
    )
    renderer._prev_view_proj = renderer.camera.view_proj
