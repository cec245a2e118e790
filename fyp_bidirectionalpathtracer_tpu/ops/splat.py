"""Splat accumulation (scatter-add of non-negative rgba contributions).

TPU scatter-add costs ~9 ms per 1M updates per channel; the light-tracing
estimator produces depth x H x W updates x 4 channels, which dominates its
cost.  `scatter_add_rgba_sorted` reduces that by sorting updates by target
pixel, segment-summing with cumulative sums (valid because contributions are
>= 0 so the running sums are monotone), and issuing one sorted scatter per
channel with at most one update per distinct pixel.

Both paths are exact up to f32 summation order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add_rgba_direct(lin, rgb, alpha, n_targets: int):
    """Baseline: 4 flat scatter-adds. lin [U] int32 (>= n_targets = dropped),
    rgb [U,3], alpha [U]."""
    chans = []
    for k in range(3):
        chans.append(
            jnp.zeros(n_targets, jnp.float32).at[lin].add(rgb[:, k], mode="drop")
        )
    chans.append(jnp.zeros(n_targets, jnp.float32).at[lin].add(alpha, mode="drop"))
    return jnp.stack(chans, -1)


def scatter_add_rgba_sorted(lin, rgb, alpha, n_targets: int):
    """Sort + segment-sum + one sorted scatter per channel."""
    keys = jnp.minimum(lin, n_targets)  # all dropped updates share one key
    ls, r, g, b, a = jax.lax.sort(
        [keys, rgb[:, 0], rgb[:, 1], rgb[:, 2], alpha], num_keys=1
    )
    is_last = jnp.concatenate([ls[1:] != ls[:-1], jnp.ones((1,), bool)])
    is_first = jnp.concatenate([jnp.ones((1,), bool), ls[1:] != ls[:-1]])

    def segment_totals(v):
        cs = jnp.cumsum(v)
        # prefix sum just before each segment start, propagated forward;
        # cummax is valid because v >= 0 keeps cs non-decreasing
        start_excl = jnp.where(is_first, cs - v, 0.0)
        carried = jax.lax.cummax(start_excl)
        return cs - carried  # segment-local running total (read at is_last)

    tgt = jnp.where(is_last, ls, n_targets)  # OOB -> dropped
    chans = []
    for v in (r, g, b, a):
        tot = segment_totals(v)
        chans.append(
            jnp.zeros(n_targets, jnp.float32)
            .at[tgt]
            .add(jnp.where(is_last, tot, 0.0), mode="drop",
                 indices_are_sorted=True)
        )
    return jnp.stack(chans, -1)


def scatter_add_rgba_packed(lin, rgb, alpha, n_targets: int,
                            alpha_is_count: bool = False):
    """Sort + segment-sum, then ONE int32 scatter-max (segment-end position
    per pixel) + ONE wide gather of the packed [U,4] totals.

    TPU scatter cost is per *update element* per operand; the direct path
    pays 4 f32 scatters of U updates, this path pays one i32 scatter of U +
    one 4-wide gather of n_targets (gathers cost the same regardless of row
    width).  Scatter-max needs no mask: the segment-end row is exactly the
    row with the maximum sort position for its key.

    alpha_is_count=True asserts every kept update has alpha==1 (true for
    the estimator-2 splats: alpha is the `ok` flag and !ok updates are
    dropped via lin>=n_targets), so alpha drops out of the sort and the
    segment total is just the segment size.
    """
    n = lin.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.minimum(lin, n_targets)  # all dropped updates share one key
    if alpha_is_count:
        ls, r, g, b = jax.lax.sort(
            [keys, rgb[:, 0], rgb[:, 1], rgb[:, 2]], num_keys=1
        )
    else:
        ls, r, g, b, a = jax.lax.sort(
            [keys, rgb[:, 0], rgb[:, 1], rgb[:, 2], alpha], num_keys=1
        )
    is_first = jnp.concatenate([jnp.ones((1,), bool), ls[1:] != ls[:-1]])

    def segment_totals(v):
        cs = jnp.cumsum(v)
        start_excl = jnp.where(is_first, cs - v, 0.0)
        carried = jax.lax.cummax(start_excl)
        return cs - carried

    if alpha_is_count:
        seg_start = jax.lax.cummax(jnp.where(is_first, iota, 0))
        a_tot = (iota - seg_start + 1).astype(jnp.float32)
    else:
        a_tot = segment_totals(a)
    tot = jnp.stack(
        [segment_totals(r), segment_totals(g), segment_totals(b), a_tot], -1
    )
    tot = jnp.concatenate([tot, jnp.zeros((1, 4), jnp.float32)], 0)

    pos = (
        jnp.full((n_targets,), -1, jnp.int32)
        .at[ls]
        .max(iota, mode="drop", indices_are_sorted=True)
    )
    return tot[jnp.where(pos < 0, n, pos)]


def scatter_add_rgba_complex(lin, rgb, alpha, n_targets: int):
    """Two complex64 scatter-adds: (r + i*g) and (b + i*alpha).

    complex64 addition is componentwise, so each scatter accumulates two
    channels exactly; if XLA's TPU scatter cost is per update row rather
    than per float, this halves the splat cost with no sort."""
    c1 = jax.lax.complex(rgb[:, 0], rgb[:, 1])
    c2 = jax.lax.complex(rgb[:, 2], alpha)
    i1 = jnp.zeros(n_targets, jnp.complex64).at[lin].add(c1, mode="drop")
    i2 = jnp.zeros(n_targets, jnp.complex64).at[lin].add(c2, mode="drop")
    return jnp.stack([i1.real, i1.imag, i2.real, i2.imag], -1)


MODES = {
    "direct": scatter_add_rgba_direct,
    "sorted": scatter_add_rgba_sorted,
    "packed": scatter_add_rgba_packed,
    "complex": scatter_add_rgba_complex,
}


def scatter_add_rgba(mode: str, lin, rgb, alpha, n_targets: int,
                     alpha_is_count: bool = False):
    """Dispatch by mode; 'auto' = 'packed' on TPU (measured 47 ms vs 77 ms
    direct for 2.8M updates into 720p), 'direct' elsewhere (keeps CPU golden
    images on the reference-ordered summation)."""
    if mode == "auto":
        mode = "packed" if jax.default_backend() == "tpu" else "direct"
    if mode == "packed":
        return scatter_add_rgba_packed(lin, rgb, alpha, n_targets,
                                       alpha_is_count)
    return MODES[mode](lin, rgb, alpha, n_targets)
