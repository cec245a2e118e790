"""Conservativeness proof for the per-cell cluster shortlist.

cell_cluster_shortlist (accel/pallas_cluster.py) hoists a bundle-level
interval-slab cull out of the cluster kernels: the kernels then loop only
ceil(count/G) groups per cell.  Its one correctness obligation is that it
NEVER drops a cluster some live ray's exact slab test would visit — a false
negative silently loses intersections.  This test checks exactly that
property against brute-force per-ray slab tests over adversarial ray
bundles (mixed octants, shared origins, shared targets, padded/inert
lanes, degenerate axis-aligned directions).

The end-to-end backstop is tests/test_cluster_kernels.py (kernel vs brute
parity), which now exercises the shortlist-bounded loops.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fyp_bidirectionalpathtracer_tpu.accel.pallas_cluster import (
    G,
    S,
    LANE,
    cell_cluster_shortlist,
)


def _exact_cluster_visits(o, d, tmin, tmax, aabbs):
    """[N, C] bool: exact per-ray slab overlap (matches _slab_tiles)."""
    inv = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1.0, d),
                   np.where(d >= 0, 2e12, -2e12))
    lo = aabbs[None, :, 0:3]
    hi = aabbs[None, :, 3:6]
    t0 = (lo - o[:, None, :]) * inv[:, None, :]
    t1 = (hi - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return (tn <= tf) & (tf >= tmin[:, None]) & (tn <= tmax[:, None])


def _rand_aabbs(rng, c):
    lo = rng.uniform(-4, 4, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 3, (c, 3)).astype(np.float32)
    return np.concatenate([lo, hi, np.zeros((c, 2), np.float32)], -1)


@pytest.mark.parametrize("mode", ["random", "fan", "bounce", "inert"])
def test_shortlist_is_conservative(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    n_cells = 3
    n = n_cells * S * LANE
    c = 21  # not a multiple of G: exercises the clamp/in_range tail
    aabbs = _rand_aabbs(rng, c)

    if mode == "fan":  # shadow fan: scattered origins, one target
        o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        tgt = np.asarray([0.5, 2.0, -0.25], np.float32)
        d = tgt - o
        dist = np.linalg.norm(d, axis=-1, keepdims=True)
        d = (d / dist).astype(np.float32)
        tmax = dist[:, 0].astype(np.float32)
    elif mode == "bounce":  # near origins per cell, random directions
        base = rng.uniform(-2, 2, (n_cells, 1, 3))
        o = (base + rng.uniform(-0.3, 0.3, (n_cells, S * LANE, 3))).reshape(
            n, 3).astype(np.float32)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = d.astype(np.float32)
        tmax = np.full(n, 1e30, np.float32)
    else:
        o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3))
        d[::7, 0] = 0.0  # exact axis-aligned components
        d[::11, 1] = 0.0
        nrm = np.linalg.norm(d, axis=-1, keepdims=True)
        d = (d / np.where(nrm == 0, 1, nrm)).astype(np.float32)
        tmax = np.full(n, 1e30, np.float32)
    tmin = np.full(n, 1e-4, np.float32)
    if mode == "inert":  # half the lanes carry empty intervals
        dead = rng.uniform(size=n) < 0.5
        tmax = np.where(dead, -1e30, tmax).astype(np.float32)

    rows = np.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmin, tmax]
    ).reshape(8, n_cells * S, LANE).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        order, ngroups, entry = cell_cluster_shortlist(
            jnp.asarray(rows), jnp.asarray(aabbs), n_cells)
        order = np.asarray(order)[:, 0, :]
        ngroups = np.asarray(ngroups)[:, 0, 0]
        entry = np.asarray(entry)[:, 0, :]

    live = tmax > tmin
    exact = _exact_cluster_visits(o, d, tmin, tmax, aabbs) & live[:, None]
    exact_cells = exact.reshape(n_cells, S * LANE, c).any(axis=1)
    for cell in range(n_cells):
        visited = set(order[cell, : ngroups[cell] * G].tolist())
        needed = set(np.nonzero(exact_cells[cell])[0].tolist())
        missing = needed - visited
        assert not missing, (
            f"{mode}: cell {cell} shortlist drops clusters {sorted(missing)}"
        )

    # the early-exit contract: entry[pos] is sorted ascending and is a
    # LOWER bound on every live ray's exact slab entry (max over per-axis
    # near, clamped to the ray's tmin) for the cluster at that position —
    # the kernels stop once min(best_t, tmax) beats the next position's
    # entry, which is only sound if this bound never overshoots.
    inv = np.where(np.abs(d) > 1e-12, 1.0 / np.where(d == 0, 1.0, d),
                   np.where(d >= 0, 2e12, -2e12))
    lo = aabbs[None, :, 0:3]
    hi = aabbs[None, :, 3:6]
    t0 = (lo - o[:, None, :]) * inv[:, None, :]
    t1 = (hi - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(-1)                       # [N, C]
    exact_entry = np.maximum(tn, tmin[:, None])
    for cell in range(n_cells):
        e = entry[cell]
        assert np.all(np.diff(e) >= 0), f"{mode}: entry not sorted"
        lanes = slice(cell * S * LANE, (cell + 1) * S * LANE)
        cell_exact = exact[lanes]
        cell_entry = exact_entry[lanes]
        n_vis = int(ngroups[cell]) * G
        for pos in range(min(n_vis, c)):
            cl = order[cell, pos]
            ray_mask = cell_exact[:, cl]
            if not ray_mask.any():
                continue
            assert e[pos] <= cell_entry[ray_mask, cl].min() + 1e-3, (
                f"{mode}: cell {cell} pos {pos} entry overshoots"
            )


def test_shortlist_tightens():
    """Sanity: a coherent fan's shortlist is much shorter than C (the whole
    point), and a fully-inert cell's count is zero."""
    rng = np.random.default_rng(0)
    n_cells = 2
    n = n_cells * S * LANE
    c = 64
    aabbs = _rand_aabbs(rng, c)
    o = np.tile(np.asarray([[0.0, 0.0, 0.0]], np.float32), (n, 1))
    o += rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    d = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 1e30, np.float32)
    tmax[S * LANE:] = -1e30  # second cell fully inert
    rows = np.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmin, tmax]
    ).reshape(8, n_cells * S, LANE).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        _, ngroups, _ = cell_cluster_shortlist(
            jnp.asarray(rows), jnp.asarray(aabbs), n_cells)
    ngroups = np.asarray(ngroups)[:, 0, 0]
    assert ngroups[0] * G < c // 2
    assert ngroups[1] == 0
