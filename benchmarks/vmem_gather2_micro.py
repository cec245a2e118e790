"""Round-3 follow-ups to vmem_gather_micro.py, one variant per flag so a
wedged remote compile doesn't block the rest.

  --sort22     one sort with 22 payload columns (the shaded-tracer unsort)
  --sort2x11   two sorts with 11 payload columns each (same data, split)
  --rowcopy    pl_rowcopy from vmem_gather_micro
  --onehot     pl_onehot from vmem_gather_micro

Usage (real chip, background):
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/vmem_gather2_micro.py --sort22
"""
from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from vmem_gather_micro import _time, N_IDX, pl_onehot, pl_rowcopy  # noqa: E402


def sort_split(n_cols, n_sorts):
    rng = np.random.default_rng(2)
    keys = jnp.asarray(rng.integers(0, 2**31, size=N_IDX, dtype=np.int32))
    payload = jnp.asarray(
        rng.integers(0, 2**31, size=(N_IDX, n_cols * n_sorts), dtype=np.int32))

    @jax.jit
    def f(k, p, salt):
        outs = []
        for s in range(n_sorts):
            ops = [k + salt] + [p[:, s * n_cols + c] for c in range(n_cols)]
            outs.append(jax.lax.sort(ops, num_keys=1)[1:])
        return outs

    return _time(f, (keys, payload),
                 out_probe=lambda rr: float(jnp.asarray(rr[0][0][0]).astype(jnp.float32)))


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "--sort22"
    try:
        if arg == "--sort22":
            ms = sort_split(22, 1)
            print(json.dumps({"variant": "sort_22payload", "ms_per_1M": round(ms, 2)}),
                  flush=True)
        elif arg == "--sort2x11":
            ms = sort_split(11, 2)
            print(json.dumps({"variant": "sort_2x11payload", "ms_per_1M": round(ms, 2)}),
                  flush=True)
        elif arg == "--rowcopy":
            ms = pl_rowcopy(196_608)
            print(json.dumps({"variant": "pl_rowcopy", "ms_per_1M": round(ms, 2)}),
                  flush=True)
        elif arg == "--onehot":
            for rows in (196_608, 983_040):
                ms, ok = pl_onehot(rows)
                print(json.dumps({"variant": "pl_onehot", "rows": rows,
                                  "ms_per_1M": round(ms, 2), "exact": ok}),
                      flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": arg, "error": repr(e)}), flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
