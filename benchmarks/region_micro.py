"""Pallas control-flow cost micro (real chip).

Measures the three candidate inner-loop structures for the cluster tiers,
per (cell, cluster) visit:
  a) pl.when region taken (current kernels)
  b) dynamic-bound fori_loop body with dynamic SMEM cluster id (no branch)
  c) straight unconditional unrolled visits (lower bound)
Each visit = one [CK,16] block load + Baldwin-Weber pair test against
[8,128] rays (the real per-visit work), accumulating best_t.
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, LANE, CK = 8, 128, 64
V = 48           # visits per cell
C = 165          # clusters available
N_CELLS = 900


def _pair(blk, o, d, tmin, bt_ref):
    col = lambda k: blk[:, k:k + 1]
    nx, ny, nz, nv0 = col(0), col(1), col(2), col(3)
    for s in range(S):
        ox, oy, oz = o[0][s:s+1], o[1][s:s+1], o[2][s:s+1]
        dx, dy, dz = d[0][s:s+1], d[1][s:s+1], d[2][s:s+1]
        ndir = nx * dx + ny * dy + nz * dz
        ok = jnp.abs(ndir) > 1e-9
        t = (nv0 - (nx*ox + ny*oy + nz*oz)) / jnp.where(ok, ndir, 1.0)
        r1x, r1y, r1z, r1v0 = col(4), col(5), col(6), col(7)
        u = (r1x*ox + r1y*oy + r1z*oz - r1v0) + t*(r1x*dx + r1y*dy + r1z*dz)
        r2x, r2y, r2z, r2v0 = col(8), col(9), col(10), col(11)
        v = (r2x*ox + r2y*oy + r2z*oz - r2v0) + t*(r2x*dx + r2y*dy + r2z*dz)
        valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin[s:s+1]) & (t < bt_ref[s:s+1, :])
        tm = jnp.where(valid, t, 1e30)
        mn = jnp.min(tm, axis=0, keepdims=True)
        bt_ref[s:s+1, :] = jnp.minimum(bt_ref[s:s+1, :], mn)


def make(variant):
    def kern(r_ref, lst_ref, cnt_ref, tri_ref, out_ref, bt_ref):
        o = (r_ref[0], r_ref[1], r_ref[2])
        d = (r_ref[3], r_ref[4], r_ref[5])
        tmin = r_ref[6]
        bt_ref[...] = jnp.full((S, LANE), 1e30, jnp.float32)
        if variant == "when":
            def body(g, _):
                bits = cnt_ref[0, 0, 1]  # all-ones mask (8 visits/group)
                for j in range(8):
                    c = lst_ref[0, 0, g * 8 + j]
                    @pl.when(((bits >> j) & 1) != 0)
                    def _():
                        _pair(tri_ref[pl.ds(c * CK, CK), :], o, d, tmin, bt_ref)
                return 0
            jax.lax.fori_loop(0, cnt_ref[0, 0, 0] // 8, body, 0)
        elif variant == "dyn":
            def body(k, _):
                c = lst_ref[0, 0, k]
                _pair(tri_ref[pl.ds(c * CK, CK), :], o, d, tmin, bt_ref)
                return 0
            jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, 0)
        else:  # unrolled static
            for k in range(V):
                c = lst_ref[0, 0, k]
                _pair(tri_ref[pl.ds(c * CK, CK), :], o, d, tmin, bt_ref)
        out_ref[...] = bt_ref[...]
    return kern


def run(variant):
    rng = np.random.default_rng(0)
    rows = rng.normal(size=(8, N_CELLS * S, LANE)).astype(np.float32)
    tri = rng.normal(size=(C * CK, 16)).astype(np.float32)
    lst = rng.integers(0, C, size=(N_CELLS, 1, C)).astype(np.int32)
    cnt = np.zeros((N_CELLS, 1, 2), np.int32)
    cnt[:, 0, 0] = V
    cnt[:, 0, 1] = 255
    f = pl.pallas_call(
        make(variant),
        grid=(N_CELLS,),
        in_specs=[
            pl.BlockSpec((8, S, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_CELLS * S, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.float32)],
    )
    g = jax.jit(lambda *a: f(*a))
    args = tuple(map(jnp.asarray, (rows, lst, cnt, tri)))
    out = g(*args); float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(*args)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / 10
    per_visit = dt / (N_CELLS * V) * 1e6
    print(f'{{"variant": "{variant}", "ms": {dt*1e3:.2f}, "us_per_visit": {per_visit:.3f}}}', flush=True)


if __name__ == "__main__":
    import sys
    for v in (sys.argv[1:] or ["unroll", "dyn", "when"]):
        run(v)
