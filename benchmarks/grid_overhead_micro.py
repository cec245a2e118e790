"""Per-program (grid) overhead of a pallas_call on this platform.

The round-4 sub-cell experiment regressed pink_room 681 -> 883 ms when the
cluster kernels went from 900 to 3600 programs per launch (same total pair
work), implying ~9 us of per-program cost.  This micro isolates it: a
minimal kernel (copy one [8, rows, 128] ray block + trivial vector op) at
equal total data but grid sizes 225..7200.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/grid_overhead_micro.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
N_COLS = 7200  # = 0.92M rays / 128


def _kernel(r_ref, out_ref):
    out_ref[0] = r_ref[0, 0] + r_ref[1, 0] * 0.5


@functools.partial(jax.jit, static_argnames=("rows",))
def run(data, rows: int):
    n_cells = N_COLS // rows
    d4 = data.reshape(8, n_cells, rows, LANE)
    return pl.pallas_call(
        _kernel,
        grid=(n_cells,),
        in_specs=[pl.BlockSpec((8, 1, rows, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, rows, LANE), jnp.float32),
    )(d4)


def main():
    data = jax.random.normal(jax.random.PRNGKey(0), (8, N_COLS, LANE))
    for rows in (32, 8, 4, 2, 1):
        if N_COLS % rows:
            continue
        out = run(data, rows)
        float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            out = run(data, rows)
        float(out.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / 20
        n_cells = N_COLS // rows
        print(json.dumps({"rows": rows, "programs": n_cells,
                          "ms": round(dt * 1e3, 3),
                          "us_per_program": round(dt * 1e6 / n_cells, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
