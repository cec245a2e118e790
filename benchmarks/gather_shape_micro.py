"""Multi-axis vs flat-index gather cost on the real chip.

gather_tier_micro found flat [N, 16]-row gathers cost ~8-12 ms/1M even from
67 MB tables, yet the texture taps (ops/texture.sample_atlas_bilinear_packed,
`packed[s, y, x]` over [T, R, R, 16]) measure ~25 ms/1M in frame replays.
This isolates the indexing form on identical data:

  a) 3-axis advanced indexing  packed[s, y, x]        (the current tap)
  b) flat row index            flat[(s*R + y)*R + x]  (the candidate)
  c) u8 48-byte rows, both forms (the sample_combined layout)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/gather_shape_micro.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters=5, warmup=2):
    for k in range(warmup):
        r = fn(*args, jnp.int32(k))
    float(jnp.asarray(r, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for k in range(iters):
        r = fn(*args, jnp.int32(k))
    float(jnp.asarray(r, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(T=28, R=256, n_idx=1_000_000):
    rng = np.random.default_rng(0)
    for cols, dt in ((16, np.float32), (48, np.uint8)):
        if dt == np.uint8:
            tab4 = rng.integers(0, 256, size=(T, R, R, cols), dtype=np.uint8)
        else:
            tab4 = rng.standard_normal((T, R, R, cols)).astype(dt)
        tab4 = jnp.asarray(tab4)
        flat = tab4.reshape(T * R * R, cols)
        s = jnp.asarray(rng.integers(0, T, size=n_idx, dtype=np.int32))
        y = jnp.asarray(rng.integers(0, R, size=n_idx, dtype=np.int32))
        x = jnp.asarray(rng.integers(0, R, size=n_idx, dtype=np.int32))

        @jax.jit
        def f3(t, s, y, x, salt):
            xx = jnp.clip(x + salt, 0, R - 1)
            return t[s, y, xx].astype(jnp.float32).sum(axis=0)

        @jax.jit
        def ff(t, s, y, x, salt):
            xx = jnp.clip(x + salt, 0, R - 1)
            i = (s * R + y) * R + xx
            return t[i].astype(jnp.float32).sum(axis=0)

        ms3 = _time(f3, (tab4, s, y, x))
        msf = _time(ff, (flat, s, y, x))
        print(json.dumps({
            "cols": cols, "dtype": np.dtype(dt).name,
            "mb": round(tab4.size * tab4.dtype.itemsize / 1e6, 1),
            "ms_3axis": round(ms3, 2), "ms_flat": round(msf, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
