"""Gather cost vs table size on the real chip (real data, random indices).

CLAUDE.md records two tiers: ~5-10 ms/1M for 'small' <=16-col tables and
~22-24 ms/1M for the 47-117 MB atlases.  This sweeps the table size to find
the boundary, for 16-col f32 rows (the packed bilinear tap) and 3-col u32
rows (a compact u8-packed candidate).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/gather_tier_micro.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_gather(n_rows: int, n_cols: int, dtype, n_idx: int = 1_000_000,
                warmup: int = 2, iters: int = 5) -> float:
    rng = np.random.default_rng(0)
    if dtype == jnp.uint32:
        table = jnp.asarray(
            rng.integers(0, 2**32, size=(n_rows, n_cols), dtype=np.uint32)
        )
    else:
        table = jnp.asarray(
            rng.standard_normal((n_rows, n_cols)).astype(np.float32)
        )
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx, dtype=np.int32))

    @jax.jit
    def f(t, i, salt):
        # salt the indices so XLA can't cache across iters
        j = jnp.clip(i + salt, 0, n_rows - 1)
        g = t[j]
        return g.sum(axis=0)

    for k in range(warmup):
        r = f(table, idx, jnp.int32(k))
    float(jnp.asarray(r, jnp.float32)[0])
    t0 = time.perf_counter()
    for k in range(iters):
        r = f(table, idx, jnp.int32(k))
    float(jnp.asarray(r, jnp.float32)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out = []
    for n_rows in (4_096, 16_384, 65_536, 131_072, 262_144, 1_048_576):
        ms16 = time_gather(n_rows, 16, jnp.float32)
        ms3 = time_gather(n_rows, 3, jnp.uint32)
        row = {
            "rows": n_rows,
            "mb_16f32": round(n_rows * 64 / 1e6, 2),
            "ms_16f32": round(ms16, 2),
            "mb_3u32": round(n_rows * 12 / 1e6, 2),
            "ms_3u32": round(ms3, 2),
        }
        print(json.dumps(row), flush=True)
        out.append(row)


if __name__ == "__main__":
    main()
