"""Scatter-add microbenchmarks: the estimator-2 splat is 3 depths x ~1M
updates x rgba into a 1280x720 image; measure XLA TPU scatter variants."""
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280
NPIX = H * W


def timeit(fn, iters=10):
    out = fn()
    _ = float(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rs = np.random.RandomState(0)

    for n in (691_200, 1_382_400, 2_764_800, 5_529_600):
        lin = jnp.asarray(rs.randint(0, NPIX, n).astype(np.int32))
        val = jnp.asarray(rs.rand(n).astype(np.float32))

        f = jax.jit(lambda l, v: jnp.zeros(NPIX, jnp.float32).at[l].add(v, mode="drop"))
        print(f"flat f32 drop        n={n/1e6:4.1f}M: {timeit(lambda: f(lin, val)):7.2f} ms", flush=True)

    n = 2_764_800
    lin = jnp.asarray(rs.randint(0, NPIX, n).astype(np.int32))
    val = jnp.asarray(rs.rand(n, 4).astype(np.float32))

    f4 = jax.jit(lambda l, v: jnp.stack(
        [jnp.zeros(NPIX, jnp.float32).at[l].add(v[:, k], mode="drop") for k in range(4)], -1))
    print(f"4x flat f32          n=2.8M: {timeit(lambda: f4(lin, val)):7.2f} ms", flush=True)

    def interleaved(l, v):
        idx = (l[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)[None, :]).reshape(-1)
        return jnp.zeros(NPIX * 4, jnp.float32).at[idx].add(v.reshape(-1), mode="drop")
    fi = jax.jit(interleaved)
    print(f"1x interleaved x4    n=2.8M: {timeit(lambda: fi(lin, val)):7.2f} ms", flush=True)

    def promise(l, v):
        l2 = jnp.minimum(l, NPIX - 1)
        return jnp.zeros(NPIX, jnp.float32).at[l2].add(v[:, 0], mode="promise_in_bounds")
    fp = jax.jit(promise)
    print(f"flat promise_bounds  n=2.8M: {timeit(lambda: fp(lin, val)):7.2f} ms", flush=True)

    def bf16(l, v):
        return jnp.zeros(NPIX, jnp.bfloat16).at[l].add(v[:, 0].astype(jnp.bfloat16), mode="drop")
    fb = jax.jit(bf16)
    print(f"flat bf16 drop       n=2.8M: {timeit(lambda: fb(lin, val)):7.2f} ms", flush=True)

    def trailing(l, v):
        return jnp.zeros((NPIX, 4), jnp.float32).at[l].add(v, mode="drop")
    ft = jax.jit(trailing)
    print(f"[N,4] trailing       n=2.8M: {timeit(lambda: ft(lin, val)):7.2f} ms", flush=True)

    srt = jax.jit(lambda l, v: jax.lax.sort([l, v[:, 0], v[:, 1], v[:, 2], v[:, 3]], num_keys=1))
    print(f"sort 5-operand       n=2.8M: {timeit(lambda: srt(lin, val)):7.2f} ms", flush=True)

    def sorted_scatter(l, v):
        ls, v0 = jax.lax.sort([l, v[:, 0]], num_keys=1)
        return jnp.zeros(NPIX, jnp.float32).at[ls].add(v0, mode="drop", indices_are_sorted=True)
    fs = jax.jit(sorted_scatter)
    print(f"sort+sorted scatter  n=2.8M: {timeit(lambda: fs(lin, val)):7.2f} ms", flush=True)

    # segment-sum into 1024-wide pages then dense add: emulate binning win
    def hist_pages(l, v):
        page = l >> 10
        return jnp.zeros(NPIX // 1024 + 1, jnp.float32).at[page].add(v[:, 0], mode="drop")
    fh = jax.jit(hist_pages)
    print(f"page-hist (900 bins) n=2.8M: {timeit(lambda: fh(lin, val)):7.2f} ms", flush=True)

    from fyp_bidirectionalpathtracer_tpu.ops import splat as splat_mod

    alpha = val[:, 3]
    for mode in ("direct", "sorted", "packed", "complex"):
        fm = jax.jit(lambda l, v, a, m=mode: splat_mod.scatter_add_rgba(m, l, v[:, :3], a, NPIX))
        print(f"rgba mode={mode:8s}   n=2.8M: {timeit(lambda: fm(lin, val, alpha)):7.2f} ms", flush=True)

    # building blocks of the packed mode
    iota = jnp.arange(n, dtype=jnp.int32)
    fsmax = jax.jit(lambda l: jnp.full((NPIX,), -1, jnp.int32).at[jnp.sort(l)].max(
        iota, mode="drop", indices_are_sorted=True))
    print(f"sorted i32 scat-max  n=2.8M: {timeit(lambda: fsmax(lin)):7.2f} ms", flush=True)
    rows = jnp.asarray(rs.rand(n + 1, 4).astype(np.float32))
    gidx = jnp.asarray(rs.randint(0, n, NPIX).astype(np.int32))
    fg = jax.jit(lambda r, i: r[i])
    print(f"wide gather 0.92M    rows=4: {timeit(lambda: fg(rows, gidx)):7.2f} ms", flush=True)
    # scatter-set variants for the packed mode's position scatter
    fset = jax.jit(lambda l: jnp.full((NPIX,), -1, jnp.int32).at[jnp.sort(l)].set(
        iota, mode="drop", indices_are_sorted=True, unique_indices=False))
    print(f"sorted i32 scat-set  n=2.8M: {timeit(lambda: fset(lin)):7.2f} ms", flush=True)
    fmax_u = jax.jit(lambda l: jnp.full((NPIX,), -1, jnp.int32).at[l].max(
        iota, mode="drop"))
    print(f"unsorted i32 max     n=2.8M: {timeit(lambda: fmax_u(lin)):7.2f} ms", flush=True)

    # packed (set-based, order-independent broadcast): full pipeline +
    # ON-DEVICE equality check vs direct
    fps = jax.jit(lambda l, v, a: splat_mod.scatter_add_rgba(
        "packed", l, v[:, :3], a, NPIX, alpha_is_count=True))
    aflag = (jnp.asarray(rs.rand(n)) < 0.7).astype(jnp.float32)
    lin_d = jnp.where(aflag > 0, lin, NPIX)  # dropped where alpha==0
    val_d = val.at[:, :3].set(val[:, :3] * aflag[:, None])
    print(f"rgba packed (set)    n=2.8M: {timeit(lambda: fps(lin_d, val_d, aflag)):7.2f} ms", flush=True)
    ref = splat_mod.scatter_add_rgba("direct", lin_d, val_d[:, :3], aflag, NPIX)
    got = fps(lin_d, val_d, aflag)
    err = float(jnp.abs(ref - got).max())
    print(f"packed max |err| vs direct: {err:.2e} "
          f"({'OK' if err < 1e-2 else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()
