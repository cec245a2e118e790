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
            kbuf, vbuf, sems, *, mxu_bf16=False, segments=1):
    t = pl.program_id(0)
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

    # per-pixel accumulation order stays the reference's depth order: the
    # segments (one per light-tracing depth) run in depth order, and blocks
    # within a segment in sorted (stable = source) order.  blk0/nblk are
    # FLAT [n_tiles * segments] (a 2-D scalar-prefetch array would be
    # lane-padded to 128 cols in SMEM — 1 MB at 1080p, over the 1 MB cap).
    for s in range(segments):
        b0 = blk0_ref[t * segments + s]
        nb = nblk_ref[t * segments + s]

        @pl.when(nb > 0)
        def _(b0=b0, nb=nb):
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
                cols = base + jax.lax.broadcasted_iota(
                    jnp.int32, (K, TILE), 1)
                if mxu_bf16:
                    # inputs already bf16-quantized (pack_bf16) and the
                    # one-hot is exactly 0/1, so bf16 MXU products are EXACT
                    # and the f32 accumulation is unchanged — bit-identical
                    # to the f32 dot on the same quantized inputs, at bf16
                    # MXU throughput.
                    onehot = (keys.reshape(K, 1) == cols).astype(jnp.bfloat16)
                    out_ref[:] += jax.lax.dot_general(
                        vbuf[slot], onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    onehot = (keys.reshape(K, 1) == cols).astype(jnp.float32)
                    out_ref[:] += jax.lax.dot_general(
                        vbuf[slot], onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                return 0

            jax.lax.fori_loop(0, nb, body, 0)


def _exp2i(e):
    """Exact 2^e for integer e in [-126, 127] (bit-assembled f32)."""
    return jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)


def _kernel_packed(blk0_ref, nblk_ref, keys_ref, pay_ref, out_ref,
                   kbuf, pbuf, sems, *, sent: int, mxu_bf16: bool):
    """rgb8e payload-direct tile kernel: consumes the sorted [1, U] i32
    rgb8e payload column DIRECTLY and unpacks mantissas in-register —
    no XLA-side decode passes, no [8, U] vals materialization (the bf16
    vals array plus ~6 decode passes cost ~0.5 ms/frame at 720p).  The
    alpha-count row is (key < sent) recomputed from the key buffer."""
    t = pl.program_id(0)
    base = t * TILE
    out_ref[:] = jnp.zeros((_ROWS, TILE), jnp.float32)
    b0 = blk0_ref[t]
    nb = nblk_ref[t]

    def copies(slot, blk):
        off = blk * K
        return (
            pltpu.make_async_copy(
                keys_ref.at[:, pl.ds(off, K)], kbuf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                pay_ref.at[:, pl.ds(off, K)], pbuf.at[slot], sems.at[slot, 1]
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
            keys = kbuf[slot]                     # [1, K] i32
            p = pbuf[slot]                        # [1, K] i32 rgb8e
            e = ((p >> 24) & 0x1F) - 16
            inv = _exp2i(e - 8)
            r = (p & 0xFF).astype(jnp.float32) * inv
            g = ((p >> 8) & 0xFF).astype(jnp.float32) * inv
            b = ((p >> 16) & 0xFF).astype(jnp.float32) * inv
            a = (keys < sent).astype(jnp.float32)
            z = jnp.zeros((4, K), jnp.float32)
            vals = jnp.concatenate([r, g, b, a, z], axis=0)  # [8, K]
            cols = base + jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 1)
            if mxu_bf16:
                # rgb8e decode is bf16-exact (8-bit mantissa, pow2 scale)
                onehot = (keys.reshape(K, 1) == cols).astype(jnp.bfloat16)
                out_ref[:] += jax.lax.dot_general(
                    vals.astype(jnp.bfloat16), onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                onehot = (keys.reshape(K, 1) == cols).astype(jnp.float32)
                out_ref[:] += jax.lax.dot_general(
                    vals, onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return 0

        jax.lax.fori_loop(0, nb, body, 0)


def _flat_reduce_packed(ls, p8, n_tiles, sent, mxu_bf16, interpret):
    """Pad + covering-block ranges + payload-direct tile kernel for a flat
    sorted (keys, rgb8e-payload) run."""
    us = ls.shape[0]
    us_pad = _round_up(max(us, K), K)
    pad = us_pad - us
    if pad:
        ls = jnp.concatenate([ls, jnp.full((pad,), sent, ls.dtype)])
        p8 = jnp.concatenate([p8, jnp.zeros((pad,), p8.dtype)])
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    off = jnp.searchsorted(ls, bounds, side="left").astype(jnp.int32)
    lo, hi = off[:-1], off[1:]
    blk0 = lo // K
    nblk = jnp.where(hi > lo, (hi - 1) // K - blk0 + 1, 0)
    return pl.pallas_call(
        functools.partial(_kernel_packed, sent=int(sent), mxu_bf16=mxu_bf16),
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
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_ROWS, n_tiles * TILE), jnp.float32),
        interpret=interpret,
    )(blk0, nblk, ls.reshape(1, us_pad), p8.reshape(1, us_pad))


def _pack_rgb8e(r, g, b):
    """Non-negative (r,g,b) -> one i32: 3x8-bit shared-exponent mantissas +
    5-bit exponent (bits 24:29).  With e = floor(log2(max))+1 every mantissa
    is <= 255 and the decode m * 2^(e-8) is EXACTLY representable in bf16
    (8-bit mantissa, power-of-two scale), so the bf16 MXU kernel loses
    nothing further.  Error <= 2^-8 of the update's max channel."""
    mx = jnp.maximum(jnp.maximum(r, g), b)
    eb = (jax.lax.bitcast_convert_type(mx, jnp.int32) >> 23) & 0xFF
    e = jnp.clip(eb - 126, -16, 15)          # floor(log2(mx)) + 1
    scale = _exp2i(8 - e)
    q = lambda c: jnp.clip(  # noqa: E731
        jnp.round(c * scale), 0.0, 255.0).astype(jnp.int32)
    return q(r) | (q(g) << 8) | (q(b) << 16) | ((e + 16) << 24)


def _unpack_rgb8e(p):
    e = ((p >> 24) & 0x1F) - 16
    inv = _exp2i(e - 8)
    c = lambda sh: ((p >> sh) & 0xFF).astype(jnp.float32) * inv  # noqa: E731
    return c(0), c(8), c(16)


def _pack2bf16(x, y):
    """Two f32 -> one i32 carrying (bf16(x) << 16) | bf16(y)."""
    xb = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    yb = jax.lax.bitcast_convert_type(y.astype(jnp.bfloat16), jnp.uint16)
    return (
        (xb.astype(jnp.uint32) << 16) | yb.astype(jnp.uint32)
    ).astype(jnp.int32)


def _unpack2bf16(p):
    u = p.astype(jnp.uint32)
    x = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    y = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF)).astype(jnp.uint16),
        jnp.bfloat16).astype(jnp.float32)
    return x, y


def _tile_call(blk0, nblk, ls2d, vals, n_tiles, vdt, mxu_bf16, s_count,
               interpret):
    """The one-hot MXU tile-reduction pallas_call (shared by the flat,
    compacted and segmented paths)."""
    return pl.pallas_call(
        functools.partial(_kernel, mxu_bf16=mxu_bf16, segments=s_count),
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
                pltpu.VMEM((2, _ROWS, K), vdt),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_ROWS, n_tiles * TILE), jnp.float32),
        interpret=interpret,
    )(blk0, nblk, ls2d, vals)


def _flat_reduce(ls, r, g, b, a, n_tiles, sent, vdt, mxu_bf16, interpret):
    """Pad + per-tile covering-block ranges + tile kernel for a FLAT
    (1-D, single-segment) sorted update run."""
    us = ls.shape[0]
    us_pad = _round_up(max(us, K), K)
    pad = us_pad - us
    if pad:
        ls = jnp.concatenate([ls, jnp.full((pad,), sent, ls.dtype)])
        z = jnp.zeros((pad,), jnp.float32)
        r, g, b, a = (jnp.concatenate([v, z]) for v in (r, g, b, a))
    vals = jnp.concatenate(
        [jnp.stack([r, g, b, a]), jnp.zeros((_ROWS - 4, us_pad), jnp.float32)]
    ).astype(vdt)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    off = jnp.searchsorted(ls, bounds, side="left").astype(jnp.int32)
    lo, hi = off[:-1], off[1:]
    blk0 = lo // K
    nblk = jnp.where(hi > lo, (hi - 1) // K - blk0 + 1, 0)
    return _tile_call(blk0, nblk, ls.reshape(1, us_pad), vals, n_tiles,
                      vdt, mxu_bf16, 1, interpret)


@functools.partial(
    jax.jit, static_argnames=("n_targets", "interpret", "compact"))
def scatter_add_rgba_tiled_prepacked(lin, packed, n_targets: int,
                                     interpret: bool = False,
                                     compact: str = "auto"):
    """rgb8e splat over a KERNEL-prepacked payload: lin [U] i32 targets
    (<0 or >= n_targets dropped), packed [U] i32 rgb8e rows (pallas_frame
    ._pack_rgb8e_tiles) -> [n_targets, 4] with alpha = update count.
    Identical reduction to scatter_add_rgba_tiled(pack='rgb8e',
    mxu_bf16=True) minus the XLA-side pack passes."""
    u = lin.shape[0]
    n_tiles = _round_up(max(n_targets, 1), TILE) // TILE
    sent_i = n_tiles * TILE
    keys = jnp.where(lin < 0, sent_i, jnp.minimum(lin, sent_i))

    from .compact import K as CK
    from .compact import compact_live

    do_compact = (compact == "on" or (compact == "auto" and not interpret))
    cap = _round_up(max(u // 3, CK), CK)
    if do_compact and cap < u:
        ck, cp, n_live = compact_live(keys, packed, n_targets, sent_i,
                                      interpret=interpret)

        def _sort_reduce(kk, pp):
            ls, p8 = jax.lax.sort([kk, pp], num_keys=1)
            return _flat_reduce_packed(ls, p8, n_tiles, sent_i, True,
                                       interpret)

        caps = sorted({_round_up(max(u // 6, CK), CK), cap})

        def ladder(rungs):
            if not rungs:
                return _sort_reduce(ck, cp)
            c0 = rungs[0]
            return jax.lax.cond(
                n_live <= c0,
                lambda: _sort_reduce(ck[:c0], cp[:c0]),
                lambda: ladder(rungs[1:]),
            )

        out = ladder(caps)
    else:
        ls, p8 = jax.lax.sort([keys, packed], num_keys=1)
        out = _flat_reduce_packed(ls, p8, n_tiles, sent_i, True, interpret)
    return out[:4, :n_targets].T


@functools.partial(
    jax.jit, static_argnames=("n_targets", "alpha_is_count", "interpret",
                              "pack", "mxu_bf16", "sort_only", "segments",
                              "compact")
)
def scatter_add_rgba_tiled(lin, rgb, alpha, n_targets: int,
                           alpha_is_count: bool = False,
                           interpret: bool = False,
                           pack: str = "f32",
                           mxu_bf16: bool = False,
                           sort_only: bool = False,
                           segments: int = 1,
                           compact: str = "auto"):
    """Drop-in for ops.splat.scatter_add_rgba_*: lin [U] i32 targets
    (<0 or >= n_targets dropped), rgb [U,3], alpha [U] -> [n_targets, 4].

    The XLA sort is the dominant cost of the reduction and scales with
    payload operands, so `pack` trades per-update input precision for
    payload columns (the per-pixel SUMS always stay exact f32):
      'f32'   — exact: r,g,b(,alpha) as separate f32 columns;
      'bf16'  — (r,g) [and (b,alpha) when alpha is real] as bf16x2-packed
                i32 columns: ~0.4% relative per channel;
      'rgb8e' — (alpha_is_count only) ONE i32 column: 8-bit shared-exponent
                mantissas, <= 2^-8 of the update's max channel (bf16-exact
                decode, so mxu_bf16 composes losslessly).
    The reference's splat is a racy non-atomic f32 RMW
    (BDPTMain.rt.hlsl:199) that can drop whole updates under contention, so
    sub-MC-noise input quantization is well inside its own reproducibility
    envelope.

    `segments` (static, dividing U) sorts S independent update runs in ONE
    batched lax.sort instead of a global sort, and the tile kernel walks
    each segment's covering blocks per tile in depth order — per-pixel
    accumulation order is the reference's either way (depth-major: the
    flat path relies on lax.sort stability over the depth-concatenated
    input).  Measured-NEGATIVE on v5e (round 4): a [S, U/S] f32 sort
    operand is sublane-padded to 8 rows, so at S=3 the sort moves ~2.7x
    the bytes of the flat 1-D sort (segments_on 34.3 vs flat ~22 ms whole
    Cornell frame), and the kernel pays S DMA pipelines + S one-hot dots
    per tile on top.  (The same padding bit the s_count==1 path when it
    briefly sorted [1, U]: +13 ms/frame — hence the explicit flat branch
    below.)  Production configs keep BDPTConfig.splat_segments=False."""
    u = lin.shape[0]
    n_tiles = _round_up(max(n_targets, 1), TILE) // TILE
    sent = jnp.int32(n_tiles * TILE)
    keys = jnp.where(lin < 0, sent, jnp.minimum(lin, sent))

    s_count = segments if (segments > 1 and u % segments == 0) else 1
    us = u // s_count
    # s_count == 1 MUST sort flat 1-D arrays: a [1, U] f32 operand is
    # sublane-padded 8x on TPU, and the padded batched sort measured
    # +13 ms on the Cornell frame (21.9 -> 35 ms whole pipeline, round 4)
    shape2 = (s_count, us) if s_count > 1 else (u,)
    k2 = keys.reshape(shape2)
    r2 = rgb[:, 0].reshape(shape2)
    g2 = rgb[:, 1].reshape(shape2)
    b2 = rgb[:, 2].reshape(shape2)

    if pack == "rgb8e":
        if not alpha_is_count:
            raise ValueError("pack='rgb8e' requires alpha_is_count")
        packed = _pack_rgb8e(r2, g2, b2)
        # --- dead-lane compaction (ops/compact.py) ---------------------
        # Only ~15% of est-2 updates are live on the flagship configs
        # (benchmarks/frame_attr_micro.py); compacting live updates into a
        # static CAPACITY = U/3 prefix lets the dominant O(U log^2 U) sort
        # run at a third of the elements.  lax.cond keeps the full-sort
        # fallback for frames whose live count exceeds the capacity —
        # both branches are BIT-IDENTICAL to the uncompacted path
        # (stable partition preserves source order; the stable sort then
        # reproduces the same per-pixel accumulation sequences).
        from .compact import K as CK
        from .compact import compact_live

        do_compact = (compact == "on"
                      or (compact == "auto" and not interpret))
        cap = _round_up(max(u // 3, CK), CK)
        if s_count == 1 and not sort_only and do_compact and cap < u:
            ck, cp, n_live = compact_live(
                keys, packed, n_targets, n_tiles * TILE, interpret=interpret)

            def _sort_reduce(kk, pp):
                ls, p8 = jax.lax.sort([kk, pp], num_keys=1)
                return _flat_reduce_packed(ls, p8, n_tiles, n_tiles * TILE,
                                           mxu_bf16, interpret)

            # capacity ladder: the sort is O(C log^2 C), so try the
            # tightest static prefix first (est-2 live fraction measured
            # ~15%, i.e. ~U/6.3 after chunk-seam padding); every rung is
            # bit-identical (same live subsequence, same stable sort)
            caps = sorted({_round_up(max(u // 6, CK), CK), cap})

            def ladder(rungs):
                if not rungs:
                    return _sort_reduce(ck, cp)
                c0 = rungs[0]
                return jax.lax.cond(
                    n_live <= c0,
                    lambda: _sort_reduce(ck[:c0], cp[:c0]),
                    lambda: ladder(rungs[1:]),
                )

            out = ladder(caps)
            return out[:4, :n_targets].T
        if s_count == 1 and not sort_only:
            ls, p8 = jax.lax.sort([k2, packed], num_keys=1)
            out = _flat_reduce_packed(ls, p8, n_tiles, n_tiles * TILE,
                                      mxu_bf16, interpret)
            return out[:4, :n_targets].T
        ls, p8 = jax.lax.sort([k2, packed], num_keys=1)
        r, g, b = _unpack_rgb8e(p8)
        a = jnp.where(ls < sent, 1.0, 0.0)
    elif pack == "bf16" and alpha_is_count:
        ls, rg, b = jax.lax.sort(
            [k2, _pack2bf16(r2, g2), b2], num_keys=1
        )
        r, g = _unpack2bf16(rg)
        a = jnp.where(ls < sent, 1.0, 0.0)
    elif pack == "bf16":
        ls, rg, ba = jax.lax.sort(
            [k2, _pack2bf16(r2, g2),
             _pack2bf16(b2, alpha.reshape(shape2))], num_keys=1
        )
        r, g = _unpack2bf16(rg)
        b, a = _unpack2bf16(ba)
    elif alpha_is_count:
        ls, r, g, b = jax.lax.sort([k2, r2, g2, b2], num_keys=1)
        a = jnp.where(ls < sent, 1.0, 0.0)
    else:
        ls, r, g, b, a = jax.lax.sort(
            [k2, r2, g2, b2, alpha.reshape(shape2)], num_keys=1
        )

    if sort_only:
        # timing attribution only (splat_mode='tiled_sortonly'): keep the
        # sort live via a data-dependent always-zero scalar, skip the kernel
        z = jnp.minimum(jnp.abs(r.reshape(-1)[0] + g.reshape(-1)[0]
                                + b.reshape(-1)[0] + a.reshape(-1)[0])
                        + ls.reshape(-1)[0].astype(jnp.float32) ** 2, 0.0)
        return jnp.zeros((n_targets, 4), jnp.float32) + z

    vdt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    if s_count == 1:
        # flat path (the production shape): 1-D pads + 1-D searchsorted
        out = _flat_reduce(ls, r, g, b, a, n_tiles, sent, vdt, mxu_bf16,
                           interpret)
        return out[:4, :n_targets].T

    us_pad = _round_up(max(us, K), K)
    pad = us_pad - us
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
    if pad:
        ls = jnp.concatenate(
            [ls, jnp.full((s_count, pad), sent, ls.dtype)], axis=1)
        z = jnp.zeros((s_count, pad), jnp.float32)
        r, g, b, a = (
            jnp.concatenate([v, z], axis=1) for v in (r, g, b, a))
    flat = lambda v: v.reshape(s_count * us_pad)  # noqa: E731
    vals = jnp.concatenate(
        [jnp.stack([flat(r), flat(g), flat(b), flat(a)]),
         jnp.zeros((_ROWS - 4, s_count * us_pad), jnp.float32)]
    ).astype(vdt)
    off = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left")
    )(ls).astype(jnp.int32)                       # [S, n_tiles+1]
    lo, hi = off[:, :-1], off[:, 1:]
    seg0 = (jnp.arange(s_count, dtype=jnp.int32) * (us_pad // K))[:, None]
    blk0 = (seg0 + lo // K).T.reshape(-1)         # flat [n_tiles * S]
    nblk = jnp.where(hi > lo, (hi - 1) // K - lo // K + 1, 0).T.reshape(-1)

    out = _tile_call(blk0, nblk, ls.reshape(1, s_count * us_pad), vals,
                     n_tiles, vdt, mxu_bf16, s_count, interpret)
    return out[:4, :n_targets].T
