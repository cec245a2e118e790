"""Kernel-level microbenchmarks on the real chip: per-launch cost of the
lane intersectors at wavefront sizes, vs triangle-pack size.

Honest timing: device->host scalar readback per block (block_until_ready is
a no-op on the tunneled platform — CLAUDE.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.accel import pallas_lane as lane
from fyp_bidirectionalpathtracer_tpu.models.procedural import cornell_box
from fyp_bidirectionalpathtracer_tpu.scene.scene import Scene


def rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(0.05, 0.95, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def timeit(fn, sync, iters=20):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    baked = Scene.from_built(cornell_box()).bake()
    tris = baked.tris
    n = 1280 * 720
    o, d = rays(n)
    print(f"device={jax.devices()[0]}, rays={n}, tris={tris.v0.shape[0]}")

    for pad_to in (None, 256):
        pack = lane.pack_tris_lane(tris)
        spack = lane.pack_shaded_tris_lane(tris, baked.data.materials)
        if pad_to and pack.shape[0] < pad_to:
            pack = jnp.pad(pack, ((0, pad_to - pack.shape[0]), (0, 0)))
            spack = jnp.pad(spack, ((0, pad_to - spack.shape[0]), (0, 0)))
        tag = f"pack={pack.shape[0]}"

        occ = None

        def occ_fn():
            nonlocal occ
            occ = lane.occluded_lanes(tris, o, d, 1e-3, t_max=None,
                                      tri_pack=pack, interpret=False)
            return occ

        dt = timeit(occ_fn, lambda *_: bool(occ[0]))
        print(f"occlusion   {tag}: {dt*1e3:7.2f} ms  ({n/dt/1e6:8.1f} Mrays/s)")

        hit = None

        def sh_fn():
            nonlocal hit
            hit, _ = lane.intersect_shaded_lanes(
                tris, spack, o, d, 1e-3, interpret=False
            )
            return hit

        dt = timeit(sh_fn, lambda *_: float(hit.t[0]))
        print(f"shaded      {tag}: {dt*1e3:7.2f} ms  ({n/dt/1e6:8.1f} Mrays/s)")


if __name__ == "__main__":
    main()
