"""Stream compaction of splat updates (TPU Pallas).

The estimator-2 light-tracing splat emits one update per (pixel, depth)
lane whether or not the connection survived its gates; on Cornell 720p
d=3 only ~15% of the 2.76M updates are live (benchmarks/frame_attr_micro
.py), yet every dead lane rides the O(U log^2 U) XLA sort as a
sentinel-key row — the single largest term of the splat cost
(BASELINE.md round-4/5).  XLA cannot compact under static shapes (scatter
is ~8 ms/M/operand, searchsorted-gather worse), but a sequential Pallas
grid can, with static shapes end to end:

  1. XLA pre-pass: per-chunk live counts (one reduction) and exclusive
     row offsets (tiny cumsum) — no in-kernel vector->scalar syncs.
  2. Kernel, grid = chunks of K=8192, sequential on one core: each chunk
     stable-partitions its updates (live first, source order preserved)
     with an unrolled bitonic network over the [64, 128] tile — the sort
     key is (dead << 13 | index), so live lanes sort to a prefix in
     original order — then DMAs its full 64-row staging block to the
     output at this chunk's ROW offset (counts rounded up to 128-lane
     rows; the <=127-element gap is sentinel-filled).  Offsets overlap:
     each chunk's sentinel tail rows are overwritten by the next chunk's
     rows, so the output is [all live updates in source order | sentinel]
     — the DMA is waited before the program ends, keeping overlapping
     writes ordered on the sequential grid.
  3. The caller sorts only a static CAPACITY-sized prefix when the live
     count fits (jax.lax.cond; the fallback branch sorts everything) —
     per-pixel accumulation order is IDENTICAL to sorting the full array
     (stable sort of the same live subsequence), so results are
     bit-identical to the uncompacted path.

Reference: the splat is a racy free RMW on DXR (BDPTMain.rt.hlsl:199);
this is the cost of making it deterministic on a sort-based machine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8192          # elements per chunk
_ROWS = K // 128  # 64 sublane-rows per chunk


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _xor_shuffle(x, j: int, interpret: bool):
    """value at partner index (linear_index XOR j) for the [_ROWS, 128]
    row-major layout (e = row*128 + lane); j a power of two < K."""
    # pltpu.roll requires non-negative shifts: roll by (size - j) == -j
    roll = jnp.roll if interpret else pltpu.roll
    if j < 128:
        plus = roll(x, 128 - j, axis=1)   # value from lane + j
        minus = roll(x, j, axis=1)        # value from lane - j
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & j) == 0, plus, minus)
    js = j // 128
    plus = roll(x, _ROWS - js, axis=0)
    minus = roll(x, js, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & js) == 0, plus, minus)


def _kernel(offs_ref, keys_ref, pay_ref, okeys_ref, opay_ref,
            okb, opb, sems, *, n_targets: int, sent: int, interpret: bool):
    c = pl.program_id(0)
    key = keys_ref[:]
    pay = pay_ref[:]
    elin = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1))
    live = key < n_targets
    skey = jnp.where(live, elin, elin + K)

    # bitonic sort by skey (unique -> total order; live keep source order)
    ks = 2
    while ks <= K:
        j = ks // 2
        while j >= 1:
            pskey = _xor_shuffle(skey, j, interpret)
            pkey = _xor_shuffle(key, j, interpret)
            ppay = _xor_shuffle(pay, j, interpret)
            take_min = ((elin & ks) == 0) == ((elin & j) == 0)
            keep_self = take_min == (skey < pskey)
            skey = jnp.where(keep_self, skey, pskey)
            key = jnp.where(keep_self, key, pkey)
            pay = jnp.where(keep_self, pay, ppay)
            j //= 2
        ks *= 2

    okb[:] = jnp.where(skey < K, key, sent)
    opb[:] = pay
    row0 = offs_ref[c]
    d1 = pltpu.make_async_copy(
        okb, okeys_ref.at[pl.ds(row0, _ROWS), :], sems.at[0])
    d2 = pltpu.make_async_copy(
        opb, opay_ref.at[pl.ds(row0, _ROWS), :], sems.at[1])
    d1.start()
    d2.start()
    # waits BEFORE the program ends: overlapping row windows across the
    # sequential grid stay ordered (chunk i's sentinel tail rows must land
    # before chunk i+1 overwrites them)
    d1.wait()
    d2.wait()


@functools.partial(
    jax.jit, static_argnames=("n_targets", "sent", "interpret"))
def compact_live(keys, pay, n_targets: int, sent: int,
                 interpret: bool = False):
    """keys [U] i32 (live iff key < n_targets; callers pre-sentinel dead
    lanes), pay [U] i32 -> (keys_c [U_pad], pay_c [U_pad], n_live_pad)
    where keys_c/pay_c hold every live update in source order in the first
    `n_live_pad` elements (n_live_pad = live count rounded up to 128 per
    chunk, with sentinel filler) and sentinel keys everywhere after."""
    u = keys.shape[0]
    u_pad = _round_up(u, K)
    if u_pad != u:
        fill = jnp.full((u_pad - u,), sent, keys.dtype)
        keys = jnp.concatenate([keys, fill])
        pay = jnp.concatenate([pay, jnp.zeros((u_pad - u,), pay.dtype)])
    nc = u_pad // K
    live = keys < n_targets
    counts = live.reshape(nc, K).sum(axis=1)
    rows = (counts + 127) // 128                       # occupied rows/chunk
    row_offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rows)[:-1].astype(jnp.int32)]
    )
    n_rows = jnp.sum(rows)

    k2 = keys.reshape(u_pad // 128, 128)
    p2 = pay.reshape(u_pad // 128, 128)
    okeys, opay = pl.pallas_call(
        functools.partial(_kernel, n_targets=n_targets, sent=sent,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((_ROWS, 128), lambda c, offs: (c, 0)),
                pl.BlockSpec((_ROWS, 128), lambda c, offs: (c, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((_ROWS, 128), jnp.int32),
                pltpu.VMEM((_ROWS, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((u_pad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((u_pad // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(row_offs, k2, p2)

    # rows beyond the last chunk's 64-row write window are uninitialized;
    # every row >= n_rows is sentinel by construction or by this fill
    grow = jax.lax.broadcasted_iota(jnp.int32, okeys.shape, 0)
    okeys = jnp.where(grow < n_rows, okeys, sent)
    return okeys.reshape(-1), opay.reshape(-1), n_rows * 128
