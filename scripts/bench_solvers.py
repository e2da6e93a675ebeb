"""Head-to-head: XLA matrix-free NR vs fused Pallas NR on TPU.

Usage: python scripts/bench_solvers.py [case] [n_envs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

from mapdn_tpu.grid import make_case
from mapdn_tpu.pf.newton import nr_solve
from mapdn_tpu.pf.pallas_nr import nr_solve_pallas


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "case33"
    n_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
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

    def bench(label, fn):
        # 60 sequential solves, data-dependent to prevent batching across steps
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
        print(f"{label:18s}: {dt*1e3:8.1f} ms /60 solves  "
              f"({60*n_envs/dt/1e6:6.2f}M solves/s, conv {conv:.3f})")

    bench("xla matrix-free", lambda p, q: nr_solve(grid, p, q))
    bench("pallas fused", lambda p, q: nr_solve_pallas(grid, p, q))
    # warm-start variants
    vm0 = jnp.ones((n_envs, n), jnp.float32)
    bench("xla warm", lambda p, q: nr_solve(grid, p, q, vm0=vm0 * 1.0,
                                            va0=jnp.zeros_like(vm0)))
    bench("pallas warm", lambda p, q: nr_solve_pallas(
        grid, p, q, vm0=vm0 * 1.0, va0=jnp.zeros_like(vm0)))


if __name__ == "__main__":
    main()
