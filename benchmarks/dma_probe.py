"""Mosaic feature probe for an HBM-resident cluster tier: per-cluster
async DMA (make_async_copy) from an ANY/HBM-space table into VMEM scratch,
inside lax.fori_loop, gated by pl.when.  Validates the pattern the
>131k-triangle demand-paged intersector needs, and times the per-cluster
DMA overhead."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, tab_hbm, out_ref, blk_vmem, acc_ref, sem,
           *, n_clusters, ck):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        gate = x_ref[...] > c.astype(jnp.float32)
        pred = jnp.sum(gate.astype(jnp.float32)) > 0.0

        @pl.when(pred)
        def _():
            cp = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(c * ck, ck), :], blk_vmem, sem
            )
            cp.start()
            cp.wait()
            contrib = jnp.sum(blk_vmem[...], axis=0, keepdims=True)
            acc_ref[...] = acc_ref[...] + jnp.where(gate, contrib, 0.0)

        return 0

    jax.lax.fori_loop(0, n_clusters, body, 0)
    out_ref[...] = acc_ref[...]


def run(n_clusters, ck, interpret):
    x = jnp.asarray(
        np.random.RandomState(0).rand(8, 128).astype(np.float32) * 3
    )
    tab = jnp.asarray(
        np.random.RandomState(1).rand(n_clusters * ck, 128).astype(np.float32)
    )
    f = jax.jit(functools.partial(
        pl.pallas_call,
        functools.partial(kernel, n_clusters=n_clusters, ck=ck),
        in_specs=[
            pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ck, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )())
    out = f(x, tab)
    ref = np.zeros((8, 128), np.float32)
    xn, tn = np.asarray(x), np.asarray(tab)
    for c in range(min(n_clusters, 3)):  # x < 3 so only clusters 0..2 gate
        gate = xn > c
        if gate.any():
            ref += np.where(gate, tn[c * ck:(c + 1) * ck].sum(0)[None, :], 0.0)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"n_clusters={n_clusters}: max err {err}")
    assert err < 1e-2, "MISMATCH"
    return f, x, tab


def main(interpret=False):
    run(4, 16, interpret)
    print("DMA PROBE OK")
    if not interpret:
        # timing: how much does a per-cluster DMA round cost?
        f, x, tab = run(256, 256, False)
        out = f(x, tab)
        _ = float(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(x, tab)
        _ = float(out[0, 0])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"256 clusters x [256,128] DMA+reduce: {dt:.3f} ms "
              f"({dt / 3 * 1e3:.1f} us per gated cluster)")


if __name__ == "__main__":
    main(interpret="--interpret" in sys.argv)
