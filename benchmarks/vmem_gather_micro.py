"""Round-3 gather lever: can a Pallas kernel beat XLA's ~24 ms/1M in-frame
row gather?  (VERDICT round-2 item #2: texture taps; also the inverse-permute
tax behind item #1 and the splat sort behind #3.)

Variants, all materializing the gathered output (standalone scalar-sum micros
lie — see CLAUDE.md):

  A  xla_arg        gather [R,12]u32 table passed as jit argument
  B  xla_const      same table closed over the jit (traced as constant)
  C  xla_sorted     A but indices pre-sorted (locality claim re-check)
  F  sort_payload   XLA sort of 1M keys carrying 12 u32 payload columns
                    (the "unsort by re-sorting" primitive)
  D  pl_rowcopy     Pallas per-row dynamic-slice copy, table VMEM-resident
                    in a [R/8, 96]i32 grouped layout (+ conditional rolls)
  H  pl_take        jnp.take inside a trivial Pallas kernel (does Mosaic
                    lower a big dynamic gather at all?)
  E  pl_onehot      sorted-window one-hot MXU gather: table bf16 [R,48]
                    streamed HBM->VMEM per tile window, rows picked by a
                    [B,WIN] bf16 one-hot matmul (exact for u8 values)

Usage (real chip, background):
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/vmem_gather_micro.py
"""
from __future__ import annotations

import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IDX = 1_000_000


def _time(fn, args, iters=5, warmup=2, out_probe=None):
    for k in range(warmup):
        r = fn(*args, jnp.int32(k))
    probe = out_probe or (lambda r: float(jnp.asarray(r).reshape(-1)[0].astype(jnp.float32)))
    probe(r)
    t0 = time.perf_counter()
    for k in range(iters):
        r = fn(*args, jnp.int32(100 + k))
    probe(r)
    return (time.perf_counter() - t0) / iters * 1e3


def make_table(r, cols=12, dtype=np.uint32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=(r, cols), dtype=np.uint32))


def make_idx(r, sorted_=False, seed=1):
    rng = np.random.default_rng(seed)
    i = rng.integers(0, r, size=N_IDX, dtype=np.int32)
    if sorted_:
        i = np.sort(i)
    return jnp.asarray(i)


# ------------------------------------------------------------------ XLA forms
def xla_arg(r):
    tab = make_table(r)
    idx = make_idx(r)

    @jax.jit
    def f(t, i, salt):
        j = (i + salt) % r
        return t[j]

    return _time(f, (tab, idx))


def xla_const(r):
    tab = make_table(r)
    idx = make_idx(r)

    @jax.jit
    def f(i, salt):
        j = (i + salt) % r
        return tab[j]

    return _time(f, (idx,))


def xla_sorted(r):
    tab = make_table(r)
    idx = make_idx(r, sorted_=True)

    @jax.jit
    def f(t, i, salt):
        j = jnp.clip(i + salt, 0, r - 1)  # keep sortedness
        return t[j]

    return _time(f, (tab, idx))


def sort_payload(n_cols):
    rng = np.random.default_rng(2)
    keys = jnp.asarray(rng.integers(0, 2**31, size=N_IDX, dtype=np.int32))
    payload = jnp.asarray(
        rng.integers(0, 2**32, size=(N_IDX, n_cols), dtype=np.uint32))

    @jax.jit
    def f(k, p, salt):
        ops = [k + salt] + [p[:, c] for c in range(n_cols)]
        out = jax.lax.sort(ops, num_keys=1)
        return out[1:]

    return _time(f, (keys, payload),
                 out_probe=lambda rr: float(jnp.asarray(rr[0][0]).astype(jnp.float32)))


# ----------------------------------------------------- D: per-row copy kernel
def pl_rowcopy(r, block=1024):
    assert r % 8 == 0
    tab = make_table(r)
    # grouped layout: 8 table rows per sublane row, lane-padded to 128
    # (Mosaic dynamic_rotate requires 128-aligned lanes) -> [R/8, 128] i32
    tab_g = jnp.pad(tab.view(jnp.int32).reshape(r // 8, 96), ((0, 0), (0, 32)))
    idx = make_idx(r)

    def kernel(idx_ref, tab_ref, out_ref):
        def body(i, _):
            rr = idx_ref[i]
            g = rr // 8
            off = rr % 8
            row = tab_ref[pl.ds(g, 1), :]  # [1, 128]
            row = pltpu.roll(row, 128 - off * 12, axis=1)  # dynamic rotate
            out_ref[pl.ds(i, 1), :] = row[:, 0:12]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    grid = N_IDX // block
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 12), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_IDX, 12), jnp.int32),
    )

    @jax.jit
    def f(t, i, salt):
        return call((i + salt) % r, t)

    got = np.asarray(f(tab_g, idx, jnp.int32(0))[:4096]).view(np.uint32)
    want = np.asarray(tab)[(np.asarray(idx[:4096])) % r]
    assert (got == want).all(), "pl_rowcopy mismatch"
    return _time(f, (tab_g, idx))


# ------------------------------------------------------------ H: in-kernel take
def pl_take(r):
    tab = make_table(r)
    idx = make_idx(r)

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, 0], axis=0)

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_IDX, 12), jnp.uint32),
    )

    @jax.jit
    def f(t, i, salt):
        return call(((i + salt) % r)[:, None], t)

    return _time(f, (tab, idx))


# ------------------------------------------- E: sorted-window one-hot MXU
def pl_onehot(r, block=1024, win=4096):
    rng = np.random.default_rng(3)
    tab8 = rng.integers(0, 256, size=(r, 48), dtype=np.uint8)
    tab_bf = jnp.asarray(tab8.astype(np.float32), jnp.bfloat16)  # exact u8
    idx_np = np.sort(rng.integers(0, r, size=N_IDX, dtype=np.int32))
    idx = jnp.asarray(idx_np)
    n_tiles = N_IDX // block

    def kernel(lo_ref, idx_ref, tab_hbm, out_ref, win_buf, sem):
        t = pl.program_id(0)
        lo = pl.multiple_of(lo_ref[t], 8)
        cp = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo, win), :], win_buf, sem)
        cp.start()
        lidx = idx_ref[:, :] - lo  # [block, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, (block, win), 1)
        onehot = (col == jnp.clip(lidx, 0, win - 1)).astype(jnp.bfloat16)
        cp.wait()
        out_ref[:, :] = jnp.dot(onehot, win_buf[:, :],
                                preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda t, lo: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, 48), lambda t, lo: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, 48), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_IDX, 48), jnp.float32),
    )

    # pad table so lo+win never overflows
    tab_pad = jnp.pad(tab_bf, ((0, win), (0, 0)))

    @jax.jit
    def f(t, i, salt):
        i = jnp.clip(i + 0 * salt, 0, r - 1)
        lo = i[::block]
        lo = jnp.minimum((lo // 8) * 8, r - 1)
        return call(lo, i[:, None], t)

    ms = _time(f, (tab_pad, idx))
    # spot-check correctness on first 4096 rows
    got = np.asarray(f(tab_pad, idx, jnp.int32(0))[:4096]).astype(np.uint8)
    want = tab8[idx_np[:4096]]
    ok = bool((got == want).all())
    return ms, ok


def main():
    for r in (196_608, 983_040):
        for name, fn in (
            ("xla_arg", xla_arg),
            ("xla_const", xla_const),
            ("xla_sorted", xla_sorted),
        ):
            try:
                ms = fn(r)
                print(json.dumps({"variant": name, "rows": r,
                                  "ms_per_1M": round(ms, 2)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "rows": r,
                                  "error": repr(e)}), flush=True)
                traceback.print_exc()
    for n_cols in (4, 8, 12, 16, 24, 32):
        try:
            ms = sort_payload(n_cols)
            print(json.dumps({"variant": f"sort_{n_cols}payload",
                              "ms_per_1M": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"sort_{n_cols}payload",
                              "error": repr(e)}), flush=True)

    for name, fn, rows in (
        ("pl_rowcopy", pl_rowcopy, 196_608),
    ):
        try:
            ms = fn(rows)
            print(json.dumps({"variant": name, "rows": rows,
                              "ms_per_1M": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "rows": rows, "error": repr(e)}),
                  flush=True)
            traceback.print_exc()

    for rows in (196_608, 983_040):
        try:
            ms, ok = pl_onehot(rows)
            print(json.dumps({"variant": "pl_onehot", "rows": rows,
                              "ms_per_1M": round(ms, 2), "exact": ok}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": "pl_onehot", "rows": rows,
                              "error": repr(e)}), flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
