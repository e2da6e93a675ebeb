"""Pallas NR kernel: interpreter-mode parity vs the XLA matrix-free solver.

The kernel itself targets TPU; on CPU the Pallas interpreter executes the
same kernel logic, so these tests validate the packed layout, masking, and
convergence loop without TPU hardware.  On-TPU parity/perf is exercised by
the verify recipe and bench.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.grid import make_case
from mapdn_tpu.pf.newton import nr_solve
from mapdn_tpu.pf.pallas_nr import get_ctx, make_auto_solver, nr_solve_pallas


def _case_injections(case, batch):
    grid, load_p, load_q, _ = make_case(case)
    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -load_p)
    np.add.at(q, np.asarray(grid.load_bus), -load_q)
    scale = np.linspace(0.6, 1.2, batch)[:, None]
    return (grid, jnp.asarray(p[None] * scale, jnp.float32),
            jnp.asarray(q[None] * scale, jnp.float32))


def test_pallas_matches_xla_case33():
    grid, pb, qb = _case_injections("case33", 8)
    ref = nr_solve(grid, pb, qb)
    out = nr_solve_pallas(grid, pb, qb, interpret=True)
    assert bool(ref.converged.all()) and bool(out.converged.all())
    np.testing.assert_allclose(out.vm, ref.vm, atol=5e-6)
    np.testing.assert_allclose(out.va, ref.va, atol=5e-6)
    np.testing.assert_allclose(out.pl_mw, ref.pl_mw, atol=2e-3)


def test_pallas_divergence_mask():
    grid, pb, qb = _case_injections("case33", 4)
    # absurd loading: lanes 2,3 unsolvable; 0,1 fine
    pb = pb.at[2:].multiply(500.0)
    out = nr_solve_pallas(grid, pb, qb, interpret=True)
    assert bool(out.converged[0]) and bool(out.converged[1])
    assert not bool(out.converged[2]) and not bool(out.converged[3])
    # solved lanes stay clean despite diverged neighbors in the same tile
    assert bool(jnp.isfinite(out.vm[:2]).all())


def test_pallas_warm_start():
    grid, pb, qb = _case_injections("case33", 8)
    cold = nr_solve_pallas(grid, pb, qb, interpret=True)
    warm = nr_solve_pallas(grid, pb, qb, interpret=True,
                           vm0=cold.vm, va0=cold.va)
    assert bool(warm.converged.all())
    np.testing.assert_allclose(warm.vm, cold.vm, atol=1e-5)


def test_ctx_padding_shapes():
    grid, _, _ = _case_injections("case141", 2)
    ctx = get_ctx(grid)
    assert ctx.npad % 128 == 0 and ctx.npad >= grid.n_bus
    assert ctx.ypack.shape == (2 * ctx.npad, 2 * ctx.npad)
    assert ctx.wpack.shape == (2 * ctx.npad, 2 * ctx.npad)


def test_auto_solver_dispatches_under_vmap():
    grid, pb, qb = _case_injections("case33", 8)
    solve = make_auto_solver(grid, backend="xla")
    n = grid.n_bus
    vm0 = jnp.ones((8, n)).at[:, 0].set(float(grid.slack_vm))
    va0 = jnp.zeros((8, n))
    res = jax.vmap(solve)(pb, qb, vm0, va0)
    ref = nr_solve(grid, pb, qb)
    assert res.vm.shape == (8, n)
    np.testing.assert_allclose(res.vm, ref.vm, atol=1e-6)


def test_pallas_n_iter_telemetry_matches_xla():
    """The kernel carries a per-lane active-iteration counter out through an
    output ref (solver-health telemetry previously lost on the Pallas path).
    Per lane n_iter must be positive and <= max_iter; the slowest lane must
    agree with the XLA path's broadcast loop count to within 1 iteration
    (step directions differ only by matmul precision)."""
    grid, pb, qb = _case_injections("case33", 8)
    ref = nr_solve(grid, pb, qb)
    out = nr_solve_pallas(grid, pb, qb, interpret=True)
    assert bool(out.converged.all())

    it = np.asarray(out.n_iter)
    assert it.shape == (8,)
    assert np.all(it >= 1) and np.all(it <= 20)
    # lanes at different loading converge in different iteration counts
    # only the slowest lane is comparable to the XLA scalar; allow +-1
    assert abs(int(it.max()) - int(np.asarray(ref.n_iter).max())) <= 1

    # warm start from the solution: every lane converges immediately
    warm = nr_solve_pallas(grid, pb, qb, interpret=True,
                           vm0=out.vm, va0=out.va)
    assert int(np.asarray(warm.n_iter).max()) <= 1


def test_pallas_small_kernel_matches_xla():
    """Transposed small-grid kernel (bus on sublanes, batch on lanes):
    parity + divergence masking + warm start, interpret mode."""
    from mapdn_tpu.pf.pallas_nr import nr_solve_pallas_small

    grid, pb, qb = _case_injections("case33", 8)
    ref = nr_solve(grid, pb, qb)
    out = nr_solve_pallas_small(grid, pb, qb, interpret=True)
    assert bool(ref.converged.all()) and bool(out.converged.all())
    np.testing.assert_allclose(out.vm, ref.vm, atol=2e-5)
    np.testing.assert_allclose(out.va, ref.va, atol=2e-5)

    # divergence isolation within a tile
    pb_bad = pb.at[2:4].multiply(500.0)
    out2 = nr_solve_pallas_small(grid, pb_bad, qb, interpret=True)
    assert bool(out2.converged[0]) and bool(out2.converged[1])
    assert not bool(out2.converged[2]) and not bool(out2.converged[3])

    # warm start from the solution converges immediately
    warm = nr_solve_pallas_small(grid, pb, qb, interpret=True,
                                 vm0=out.vm, va0=out.va)
    assert bool(warm.converged.all())
    assert int(warm.n_iter.max()) == 0


def test_pallas_small_kernel_case141():
    """nb > 64 tile class (141-bus): padding/masking still correct."""
    from mapdn_tpu.pf.pallas_nr import nr_solve_pallas_small

    grid, pb, qb = _case_injections("case141", 4)
    ref = nr_solve(grid, pb, qb)
    out = nr_solve_pallas_small(grid, pb, qb, interpret=True)
    assert bool(ref.converged.all()) and bool(out.converged.all())
    np.testing.assert_allclose(out.vm, ref.vm, atol=5e-5)
