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
  2. Kernel, grid = chunks of K=16384, sequential on one core: each
     chunk packs its live updates to a prefix IN SOURCE ORDER with a
     butterfly routing network (below), then DMAs its full staging block
     to the output at this chunk's ROW offset (counts rounded up to
     128-lane rows; the <=127-element gap is sentinel-filled).  Offsets
     overlap: each chunk's sentinel tail rows are overwritten by the
     next chunk's rows, so the output is [all live updates in source
     order | sentinel].  The store DMA is double-buffered and waited one
     program late, keeping overlapping writes ordered on the sequential
     grid while hiding the store under the next chunk's compute.
  3. The caller sorts only a static CAPACITY-sized prefix when the live
     count fits (jax.lax.cond ladder; the fallback branch sorts
     everything) — per-pixel accumulation order is IDENTICAL to sorting
     the full array (stable partition preserves source order; the stable
     sort then reproduces the same per-pixel sequences), so results are
     bit-identical to the uncompacted path.

Butterfly packing (replaces a 91-pass bitonic; ~4x less vector work):
each live element must move LEFT by shift(i) = i - rank(i) (exclusive
prefix count of live).  shift is non-decreasing in i, so routing the
shift bits LSB->MSB is collision-free: a mover (bit k set, lower bits
already consumed so shift = 0 mod 2^k) can only collide with a
stationary live element 2^k to its left if their shifts — both multiples
of 2^k — differ by less than 2^k while differing in bit k, a
contradiction.  Vacated slots have their shift cleared so stale copies
never propagate; positions >= total-live are overwritten with the
sentinel at the end.  Cost: a 14-pass Hillis-Steele scan (ranks), a
14-pass butterfly allreduce (total), and 14 routing passes over
(key, payload, shift) — all pltpu.roll + select vector work on the
[128, 128] chunk tile.

Reference: the splat is a racy free RMW on DXR (BDPTMain.rt.hlsl:199);
this is the cost of making it deterministic on a sort-based machine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 16384         # elements per chunk
_ROWS = K // 128  # 128 sublane-rows per chunk
_NSTEP = 14       # log2(K)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fetch_left(x, st: int, interpret: bool):
    """value at linear index (i - st) for the [_ROWS, 128] row-major
    layout; garbage for i < st (callers mask)."""
    roll = jnp.roll if interpret else pltpu.roll
    if st < 128:
        r = roll(x, st, axis=1)
        rr = roll(r, 1, axis=0)          # wrapped lanes: previous row
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(lane >= st, r, rr)
    return roll(x, st // 128, axis=0)


def _fetch_right(x, st: int, interpret: bool):
    """value at linear index (i + st); garbage for i >= K - st."""
    roll = jnp.roll if interpret else pltpu.roll
    if st < 128:
        r = roll(x, 128 - st, axis=1)
        rr = roll(r, _ROWS - 1, axis=0)  # wrapped lanes: next row
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(lane < 128 - st, r, rr)
    return roll(x, _ROWS - st // 128, axis=0)


def _xor_shuffle(x, j: int, interpret: bool):
    """value at partner index (i XOR j); j a power of two < K."""
    left = _fetch_left(x, j, interpret)
    right = _fetch_right(x, j, interpret)
    if j < 128:
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) * 128
    return jnp.where((idx & j) == 0, right, left)


def _kernel(offs_ref, keys_ref, pay_ref, okeys_ref, opay_ref,
            okb, opb, sems, *, n_targets: int, sent: int, n_chunks: int,
            interpret: bool):
    c = pl.program_id(0)
    key = keys_ref[:]
    pay = pay_ref[:]
    elin = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1))
    live = (key < n_targets).astype(jnp.int32)

    # exclusive prefix rank via Hillis-Steele inclusive scan
    s = live
    for k in range(_NSTEP):
        st = 1 << k
        s = s + jnp.where(elin >= st, _fetch_left(s, st, interpret), 0)
    rank = s - live
    # total live broadcast to every lane (butterfly allreduce)
    t = live
    for k in range(_NSTEP):
        t = t + _xor_shuffle(t, 1 << k, interpret)
    shift = jnp.where(live > 0, elin - rank, 0)

    # butterfly packing: route shift bits LSB->MSB (see module docstring)
    for k in range(_NSTEP):
        st = 1 << k
        in_sh = _fetch_right(shift, st, interpret)
        movein = ((in_sh & st) != 0) & (elin < K - st)
        in_key = _fetch_right(key, st, interpret)
        in_pay = _fetch_right(pay, st, interpret)
        vacated = (shift & st) != 0
        key = jnp.where(movein, in_key, key)
        pay = jnp.where(movein, in_pay, pay)
        shift = jnp.where(movein, in_sh - st,
                          jnp.where(vacated, 0, shift))

    slot = jax.lax.rem(c, 2)
    # wait the PREVIOUS chunk's store before ours starts (overlapping row
    # windows must land in grid order); our own store drains under the
    # next chunk's compute
    @pl.when(c > 0)
    def _():
        prev = 1 - slot
        pltpu.make_async_copy(
            okb.at[prev], okeys_ref.at[pl.ds(0, _ROWS), :], sems.at[prev, 0]
        ).wait()
        pltpu.make_async_copy(
            opb.at[prev], opay_ref.at[pl.ds(0, _ROWS), :], sems.at[prev, 1]
        ).wait()

    okb[slot] = jnp.where(elin < t, key, sent)
    opb[slot] = pay
    row0 = offs_ref[c]
    pltpu.make_async_copy(
        okb.at[slot], okeys_ref.at[pl.ds(row0, _ROWS), :], sems.at[slot, 0]
    ).start()
    pltpu.make_async_copy(
        opb.at[slot], opay_ref.at[pl.ds(row0, _ROWS), :], sems.at[slot, 1]
    ).start()

    @pl.when(c == n_chunks - 1)
    def _():
        pltpu.make_async_copy(
            okb.at[slot], okeys_ref.at[pl.ds(row0, _ROWS), :], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            opb.at[slot], opay_ref.at[pl.ds(row0, _ROWS), :], sems.at[slot, 1]
        ).wait()


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
                          n_chunks=nc, interpret=interpret),
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
                pltpu.VMEM((2, _ROWS, 128), jnp.int32),
                pltpu.VMEM((2, _ROWS, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((u_pad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((u_pad // 128, 128), jnp.int32),
        ],
        interpret=interpret,
    )(row_offs, k2, p2)

    # rows beyond the last chunk's write window are uninitialized; every
    # row >= n_rows is sentinel by construction or by this fill
    grow = jax.lax.broadcasted_iota(jnp.int32, okeys.shape, 0)
    okeys = jnp.where(grow < n_rows, okeys, sent)
    return okeys.reshape(-1), opay.reshape(-1), n_rows * 128
