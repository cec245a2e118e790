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
