"""Mosaic feature probe for the clustered intersector (accel/pallas_cluster):
scalar any() reduction feeding pl.when, dynamic sublane slicing inside
lax.fori_loop, and scratch-ref accumulation.  Run on TPU; also works in
interpret mode (pass --interpret)."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, tab_ref, out_ref, acc_ref, *, n_clusters, ck):
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        # dynamic sublane slice of the table
        block = tab_ref[pl.ds(c * ck, ck), :]          # [ck, 128]
        gate = x_ref[...] > c.astype(jnp.float32)      # [8, 128]
        pred = jnp.sum(gate.astype(jnp.float32)) > 0.0  # scalar reduction

        @pl.when(pred)
        def _():
            contrib = jnp.sum(block, axis=0, keepdims=True)  # [1, 128]
            acc_ref[...] = acc_ref[...] + jnp.where(
                gate, contrib, 0.0
            )

        return 0

    jax.lax.fori_loop(0, n_clusters, body, 0)
    out_ref[...] = acc_ref[...]


def main(interpret=False):
    n_clusters, ck = 4, 16
    x = jnp.asarray(np.random.RandomState(0).rand(8, 128).astype(np.float32) * 3)
    tab = jnp.asarray(
        np.random.RandomState(1).rand(n_clusters * ck, 128).astype(np.float32)
    )
    out = pl.pallas_call(
        functools.partial(kernel, n_clusters=n_clusters, ck=ck),
        in_specs=[
            pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tab.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(x, tab)
    # reference
    ref = np.zeros((8, 128), np.float32)
    xn = np.asarray(x)
    tn = np.asarray(tab)
    for c in range(n_clusters):
        gate = xn > c
        if gate.any():
            ref += np.where(gate, tn[c * ck:(c + 1) * ck].sum(0)[None, :], 0.0)
    err = np.abs(np.asarray(out) - ref).max()
    print("max err:", err)
    assert err < 1e-3, "MISMATCH"
    print("PROBE OK")


if __name__ == "__main__":
    main(interpret="--interpret" in sys.argv)
