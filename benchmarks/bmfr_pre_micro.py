"""BMFR preprocess-only timing at 720p: isolates the reprojection cost and
compares 2D advanced-index gathers vs flat-index gathers."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fyp_bidirectionalpathtracer_tpu.passes import bmfr
from fyp_bidirectionalpathtracer_tpu.utils.config import BMFRConfig

H, W = 720, 1280


def timeit(fn, sync, iters=10):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rs = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rs.rand(*s).astype(np.float32))  # noqa: E731
    state = bmfr.BMFRState(
        prev_pos=f(H, W, 4), prev_norm=f(H, W, 4), prev_noisy=f(H, W, 4),
        prev_filtered=f(H, W, 4), frame_number=jnp.int32(3),
    )
    cur_pos = f(H, W, 4)
    cur_norm = f(H, W, 4)
    cur_noisy = f(H, W, 4)
    pvp = jnp.eye(4, dtype=jnp.float32)
    cfg = BMFRConfig(enabled=True)

    run = jax.jit(functools.partial(bmfr.preprocess, cfg=cfg))
    out = [None]

    def go():
        noisy, accept, ppf = run(state, cur_pos, cur_norm, cur_noisy, pvp)
        out[0] = noisy

    dt = timeit(go, lambda: float(out[0][0, 0, 0]))
    print(f"preprocess (current) : {dt:7.2f} ms", flush=True)

    # isolate the gather: 2D advanced indexing vs flat
    pack = f(H + 1, W + 1, 40)
    gy = jnp.asarray(rs.randint(0, H, (H, W)).astype(np.int32))
    gx = jnp.asarray(rs.randint(0, W, (H, W)).astype(np.int32))
    g2 = jax.jit(lambda p, y, x: p[y, x])
    dt = timeit(lambda: out.__setitem__(0, g2(pack, gy, gx)),
                lambda: float(out[0][0, 0, 0]))
    print(f"2D-index gather      : {dt:7.2f} ms", flush=True)
    gf = jax.jit(
        lambda p, y, x: p.reshape(-1, 40)[y * (W + 1) + x]
    )
    dt = timeit(lambda: out.__setitem__(0, gf(pack, gy, gx)),
                lambda: float(out[0][0, 0, 0]))
    print(f"flat-index gather    : {dt:7.2f} ms", flush=True)

    # width scaling curve (single flat gather of 0.92M rows)
    for width in (4, 8, 10, 16, 20, 32):
        tab = f((H + 1) * (W + 1), width)
        gw = jax.jit(lambda p, y, x: p[y * (W + 1) + x])
        dt = timeit(lambda: out.__setitem__(0, gw(tab, gy, gx)),
                    lambda: float(out[0][0, 0, 0]))
        print(f"flat gather width={width:2d} : {dt:7.2f} ms", flush=True)

    # 4 x 10-col gathers at 4 different index sets (the per-tap layout)
    tab10 = f((H + 1) * (W + 1), 10)
    g4 = jax.jit(lambda p, y, x: [
        p[(y + dy) * (W + 1) + (x + dx)]
        for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1))
    ])
    dt = timeit(lambda: out.__setitem__(0, g4(tab10, gy, gx)[0]),
                lambda: float(out[0].reshape(-1)[0]))
    print(f"4x 10-col tap gathers: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
