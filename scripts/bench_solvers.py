"""Head-to-head: XLA matrix-free NR vs fused Pallas NR on TPU.

The measurement behind the env's pf_backend='auto' dispatch policy
(mapdn_tpu/pf/pallas_nr.py make_auto_solver): 60 sequential batched solves
per timing (the training chunk's access pattern), cold and warm starts.

Usage:
  python scripts/bench_solvers.py [case] [n_envs]   # one case, print only
  python scripts/bench_solvers.py out.json          # full sweep -> JSON
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp

from mapdn_tpu.grid import make_case
from mapdn_tpu.pf.newton import nr_solve
from mapdn_tpu.pf.pallas_nr import nr_solve_pallas, nr_solve_pallas_small

SWEEP = [("case33", 8192), ("case141", 4096), ("case322", 4096)]


def bench_case(case, n_envs):
    grid, load_p, load_q, pv_max = make_case(case)
    n = grid.n_bus

    key = jax.random.PRNGKey(0)
    p = jnp.zeros((n_envs, n), jnp.float32)
    q = jnp.zeros((n_envs, n), jnp.float32)
    scale = jax.random.uniform(key, (n_envs, 1), minval=0.3, maxval=1.3)
    pl = -jnp.asarray(load_p, jnp.float32) / grid.sn_mva
    ql = -jnp.asarray(load_q, jnp.float32) / grid.sn_mva
    p = p.at[:, jnp.asarray(grid.load_bus)].add(pl * scale)
    q = q.at[:, jnp.asarray(grid.load_bus)].add(ql * scale)

    rows = []

    def bench(label, fn):
        # 60 sequential solves, data-dependent to prevent batching across
        # steps (the chunk's access pattern)
        @jax.jit
        def run(p, q):
            def body(c, _):
                p, q = c
                res = fn(p, q)
                p = p * 0.999 + 1e-7 * res.vm
                return (p, q), res.converged
            (p, q), conv = jax.lax.scan(body, (p, q), None, length=60)
            return p, conv
        out = run(p, q)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(p, q)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        conv = float(jnp.mean(out[1].astype(jnp.float32)))
        ms = 60 * n_envs / dt / 1e6
        print(f"{case} {label:18s}: {dt*1e3:8.1f} ms /60 solves  "
              f"({ms:6.2f}M solves/s, conv {conv:.3f})", flush=True)
        rows.append({"case": case, "n_envs": n_envs, "solver": label,
                     "msolves_per_s": round(ms, 3), "converged": conv})

    bench("xla matrix-free", lambda p, q: nr_solve(grid, p, q))
    bench("pallas fused", lambda p, q: nr_solve_pallas(grid, p, q))
    if grid.n_bus <= 200:
        bench("pallas small-T", lambda p, q: nr_solve_pallas_small(grid, p, q))
    # warm-start variants (the env warm-starts from the previous solution)
    vm0 = jnp.ones((n_envs, n), jnp.float32)
    bench("xla warm", lambda p, q: nr_solve(grid, p, q, vm0=vm0 * 1.0,
                                            va0=jnp.zeros_like(vm0)))
    bench("pallas warm", lambda p, q: nr_solve_pallas(
        grid, p, q, vm0=vm0 * 1.0, va0=jnp.zeros_like(vm0)))
    if grid.n_bus <= 200:
        bench("pallas small-T warm", lambda p, q: nr_solve_pallas_small(
            grid, p, q, vm0=vm0 * 1.0, va0=jnp.zeros_like(vm0)))
    return rows


def main():
    if len(sys.argv) > 1 and sys.argv[1].endswith(".json"):
        rows = []
        for case, n_envs in SWEEP:
            rows.extend(bench_case(case, n_envs))
        out = {"metric": "batched NR solver head-to-head (60 sequential "
                         "solves, training access pattern)",
               "platform": jax.default_backend(), "rows": rows}
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return
    case = sys.argv[1] if len(sys.argv) > 1 else "case33"
    n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    bench_case(case, n_envs)


if __name__ == "__main__":
    main()
