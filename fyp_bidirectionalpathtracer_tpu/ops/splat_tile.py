"""Tiled Pallas splat reduction (estimator-2 scatter-add replacement).

The packed mode in ops/splat.py pays XLA sort (~13 ms) + i32 scatter-max
(~16 ms) + two wide gathers (~10 ms) for 2.8M updates.  The sort is the
only part XLA does competitively; everything after it is just "sum each
pixel's contiguous run of sorted updates", which maps onto the MXU:

  1. sort updates by target pixel (XLA, unavoidable for grouping);
  2. per 1024-pixel tile, find the covering range of sorted rows with a
     tiny searchsorted (boundaries are the 900 tile edges, not a scatter);
  3. ONE Pallas kernel, grid = tiles: each program double-buffer-DMAs its
     K-update blocks from HBM and accumulates
        acc[8, TILE] += V[8, K] @ onehot(key - base)[K, TILE]
     on the MXU.  The one-hot is exact, so each pixel's total is an exact
     f32 sequential sum of its updates — no fixed-point quantization, no
     prefix-sum cancellation (the failure mode that forced packed mode's
     int32 dance).

Rows of V: r, g, b, alpha (ones when alpha_is_count), 4 spare.  Dropped
updates (target >= n_targets) sort to the tail and never match a one-hot
column; block-alignment slop is likewise masked for free by the one-hot.

Reference semantics: BDPTMain.rt.hlsl:171-208 (light-tracing splats are
non-atomic RMW adds there; here the reduction is deterministic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024     # pixels per grid program
K = 2048        # sorted updates per DMA block
_ROWS = 8       # channel rows (r,g,b,a + 4 spare) — f32 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(blk0_ref, nblk_ref, keys_ref, vals_ref, out_ref,
            kbuf, vbuf, sems):
    t = pl.program_id(0)
    b0 = blk0_ref[t]
    nb = nblk_ref[t]
    base = t * TILE
    out_ref[:] = jnp.zeros((_ROWS, TILE), jnp.float32)

    def copies(slot, blk):
        off = blk * K
        return (
            pltpu.make_async_copy(
                keys_ref.at[:, pl.ds(off, K)], kbuf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                vals_ref.at[:, pl.ds(off, K)], vbuf.at[slot], sems.at[slot, 1]
            ),
        )

    @pl.when(nb > 0)
    def _():
        for c in copies(0, b0):
            c.start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nb)
            def _():
                for c in copies(1 - slot, b0 + i + 1):
                    c.start()

            for c in copies(slot, b0 + i):
                c.wait()
            keys = kbuf[slot]                      # [1, K]
            cols = base + jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 1)
            onehot = (keys.reshape(K, 1) == cols).astype(jnp.float32)
            out_ref[:] += jax.lax.dot_general(
                vbuf[slot], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_targets", "alpha_is_count", "interpret")
)
def scatter_add_rgba_tiled(lin, rgb, alpha, n_targets: int,
                           alpha_is_count: bool = False,
                           interpret: bool = False):
    """Drop-in for ops.splat.scatter_add_rgba_*: lin [U] i32 targets
    (<0 or >= n_targets dropped), rgb [U,3], alpha [U] -> [n_targets, 4]."""
    u = lin.shape[0]
    n_tiles = _round_up(max(n_targets, 1), TILE) // TILE
    sent = jnp.int32(n_tiles * TILE)
    keys = jnp.where(lin < 0, sent, jnp.minimum(lin, sent))

    if alpha_is_count:
        ls, r, g, b = jax.lax.sort(
            [keys, rgb[:, 0], rgb[:, 1], rgb[:, 2]], num_keys=1
        )
        a = jnp.where(ls < sent, 1.0, 0.0)
    else:
        ls, r, g, b, a = jax.lax.sort(
            [keys, rgb[:, 0], rgb[:, 1], rgb[:, 2], alpha], num_keys=1
        )

    u_pad = _round_up(max(u, K), K)
    pad = u_pad - u
    if pad:
        ls = jnp.concatenate([ls, jnp.full((pad,), sent, ls.dtype)])
        z = jnp.zeros((pad,), jnp.float32)
        r, g, b, a = (jnp.concatenate([v, z]) for v in (r, g, b, a))
    vals = jnp.concatenate(
        [jnp.stack([r, g, b, a]), jnp.zeros((_ROWS - 4, u_pad), jnp.float32)]
    )

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    off = jnp.searchsorted(ls, bounds, side="left").astype(jnp.int32)
    lo, hi = off[:-1], off[1:]
    blk0 = lo // K
    nblk = jnp.where(hi > lo, (hi - 1) // K - blk0 + 1, 0)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_ROWS, TILE), lambda t, b0, nb: (0, t)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((2, _ROWS, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_ROWS, n_tiles * TILE), jnp.float32),
        interpret=interpret,
    )(blk0, nblk, ls.reshape(1, u_pad), vals)

    return out[:4, :n_targets].T
