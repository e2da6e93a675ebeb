"""Power-flow parity: JAX batched NR vs independent numpy oracle.

Mirrors the reference's de-facto physics oracle role of pandapower
(SURVEY.md section 4): two independent NR implementations agreeing to 1e-8
in float64 on all three cases.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mapdn_tpu.grid import make_case
from mapdn_tpu.pf import nr_solve, branch_results
from mapdn_tpu.pf.reference import nr_solve_ref, branch_results_ref


def _injections(grid, load_p, load_q, sgen_p, sgen_q):
    """Net per-bus injections [pu], generation positive."""
    n = grid.n_bus
    p = np.zeros(n)
    q = np.zeros(n)
    np.add.at(p, np.asarray(grid.load_bus), -np.asarray(load_p))
    np.add.at(q, np.asarray(grid.load_bus), -np.asarray(load_q))
    np.add.at(p, np.asarray(grid.sgen_bus), np.asarray(sgen_p))
    np.add.at(q, np.asarray(grid.sgen_bus), np.asarray(sgen_q))
    return p / grid.sn_mva, q / grid.sn_mva


@pytest.mark.parametrize("case", ["case33", "case141", "case322"])
def test_nr_matches_oracle(case):
    grid, load_p, load_q, pv_max = make_case(case, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    sgen_p = pv_max * rng.uniform(0.2, 0.9, len(pv_max))
    sgen_q = pv_max * rng.uniform(-0.3, 0.3, len(pv_max))
    p, q = _injections(grid, load_p, load_q, sgen_p, sgen_q)

    vm_o, va_o, conv_o, _ = nr_solve_ref(
        np.asarray(grid.g_mat), np.asarray(grid.b_mat), p, q, tol=1e-10)
    assert conv_o

    res = nr_solve(grid, jnp.asarray(p)[None], jnp.asarray(q)[None], tol=1e-10)
    assert bool(res.converged[0])
    np.testing.assert_allclose(np.asarray(res.vm[0]), vm_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.va[0]), va_o, atol=1e-8)

    # branch losses agree with the oracle's complex-arithmetic computation
    pl_o = branch_results_ref(
        vm_o, va_o, np.asarray(grid.f_bus), np.asarray(grid.t_bus),
        np.asarray(grid.br_r), np.asarray(grid.br_x), np.asarray(grid.br_b),
        np.asarray(grid.tap), grid.sn_mva)
    np.testing.assert_allclose(np.asarray(res.pl_mw[0]), pl_o, atol=1e-8)
    assert np.all(pl_o >= -1e-12)  # passive branches only dissipate


def test_nr_batched_lanes_independent():
    """A batch of different injections equals per-lane single solves."""
    grid, load_p, load_q, pv_max = make_case("case33", dtype=jnp.float64)
    rng = np.random.RandomState(1)
    B = 7
    ps, qs = [], []
    for i in range(B):
        scale = rng.uniform(0.5, 1.5)
        sgen_p = pv_max * rng.uniform(0, 1, len(pv_max))
        sgen_q = pv_max * rng.uniform(-0.5, 0.5, len(pv_max))
        p, q = _injections(grid, load_p * scale, load_q * scale, sgen_p, sgen_q)
        ps.append(p)
        qs.append(q)
    ps = jnp.asarray(np.stack(ps))
    qs = jnp.asarray(np.stack(qs))
    res = nr_solve(grid, ps, qs, tol=1e-10)
    assert bool(jnp.all(res.converged))
    for i in range(B):
        vm_o, va_o, conv, _ = nr_solve_ref(
            np.asarray(grid.g_mat), np.asarray(grid.b_mat),
            np.asarray(ps[i]), np.asarray(qs[i]), tol=1e-10)
        assert conv
        np.testing.assert_allclose(np.asarray(res.vm[i]), vm_o, atol=1e-8)


def test_nr_divergence_flagged_not_raised():
    """Infeasible loading must set converged=False (the jit-safe analog of
    pandapower's ppException, reference voltage_control_env.py:183-196) and
    must not poison other lanes of the batch."""
    grid, load_p, load_q, _ = make_case("case33", dtype=jnp.float64)
    p_ok, q_ok = _injections(grid, load_p, load_q, 0 * load_p[:6], 0 * load_p[:6])
    # 10,000x overload is far beyond the feeder's maximum loadability
    p_bad, q_bad = p_ok * 1e4, q_ok * 1e4
    ps = jnp.asarray(np.stack([p_ok, p_bad]))
    qs = jnp.asarray(np.stack([q_ok, q_bad]))
    res = nr_solve(grid, ps, qs, tol=1e-10)
    assert bool(res.converged[0])
    assert not bool(res.converged[1])
    assert np.all(np.isfinite(np.asarray(res.vm[0])))


def test_slack_balances_network():
    """Slack bus injection equals total load + losses (power balance)."""
    grid, load_p, load_q, _ = make_case("case33", dtype=jnp.float64)
    p, q = _injections(grid, load_p, load_q, np.zeros(6), np.zeros(6))
    res = nr_solve(grid, jnp.asarray(p)[None], jnp.asarray(q)[None], tol=1e-10)
    slack_gen_mw = -float(res.p_bus[0, 0])  # consumption-positive convention
    total_load = float(np.sum(load_p))
    total_loss = float(jnp.sum(res.pl_mw[0]))
    np.testing.assert_allclose(slack_gen_mw, total_load + total_loss, atol=1e-7)


def test_fixed_iter_matches_while_path():
    """nr_solve(fixed_iter=N) is the same Newton recursion as the while
    path, statically unrolled with masked freezes: identical fixed point
    and convergence verdicts (f64)."""
    import jax.numpy as jnp
    import numpy as np

    from mapdn_tpu.grid import make_case
    from mapdn_tpu.pf.newton import nr_solve

    grid, lp, lq, _ = make_case("case33", dtype=jnp.float64)
    n = grid.n_bus
    rng = np.random.RandomState(3)
    B = 32
    p = np.zeros((B, n))
    q = np.zeros((B, n))
    for b in range(B):
        s = 0.4 + rng.rand()
        np.add.at(p[b], np.asarray(grid.load_bus), -np.asarray(lp) * s)
        np.add.at(q[b], np.asarray(grid.load_bus), -np.asarray(lq) * s)
    P, Q = jnp.asarray(p), jnp.asarray(q)
    r_while = nr_solve(grid, P, Q, tol=1e-9)
    r_fixed = nr_solve(grid, P, Q, tol=1e-9, fixed_iter=10)
    assert bool(r_while.converged.all()) and bool(r_fixed.converged.all())
    np.testing.assert_allclose(np.asarray(r_fixed.vm), np.asarray(r_while.vm),
                               atol=1e-12)
    # an insufficient budget must report non-convergence, not wrong numbers
    r_short = nr_solve(grid, P, Q, tol=1e-9, fixed_iter=1)
    assert not bool(r_short.converged.all())


@pytest.mark.parametrize("seed,n_bus,n_load,n_sgen,n_zone", [
    (1, 24, 14, 4, 3),
    (2, 57, 35, 7, 5),
    (3, 101, 60, 11, 7),
    (4, 203, 150, 19, 11),
])
def test_nr_matches_oracle_random_feeders(seed, n_bus, n_load, n_sgen,
                                          n_zone):
    """Property-style parity: the batched JAX NR agrees with the
    independent numpy oracle on RANDOM radial feeders of varied size and
    topology, not just the four shipped cases — guards the solver against
    overfitting to the known networks' conditioning."""
    from mapdn_tpu.grid.cases import _synthetic_radial

    grid, load_p, load_q, pv_max = _synthetic_radial(
        f"rand{seed}", n_bus, n_load, n_sgen, n_zone, vn_kv=12.5,
        total_load_mw=0.09 * n_bus, pv_penetration=2.0, seed=1000 + seed,
        dtype=jnp.float64)
    rng = np.random.RandomState(seed)
    sgen_p = pv_max * rng.uniform(0.2, 0.9, len(pv_max))
    sgen_q = pv_max * rng.uniform(-0.3, 0.3, len(pv_max))
    p, q = _injections(grid, load_p, load_q, sgen_p, sgen_q)

    vm_o, va_o, conv_o, _ = nr_solve_ref(
        np.asarray(grid.g_mat), np.asarray(grid.b_mat), p, q, tol=1e-10)
    assert conv_o

    res = nr_solve(grid, jnp.asarray(p)[None], jnp.asarray(q)[None],
                   tol=1e-10)
    assert bool(res.converged[0])
    # 1e-6 (vs the shipped cases' 1e-8): both implementations meet the
    # 1e-10 power-mismatch tolerance, but an arbitrary random feeder's
    # Jacobian conditioning amplifies that into ~1e-7 state disagreement
    np.testing.assert_allclose(np.asarray(res.vm[0]), vm_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.va[0]), va_o, atol=1e-6)
