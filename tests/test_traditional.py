"""Droop / OPF traditional-control baselines (SURVEY.md component #25).

These double as physics sanity oracles: droop must push voltages toward the
deadband; OPF must not be worse than no control on its own objective.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mapdn_tpu.envs import EnvConfig, make_env
from mapdn_tpu.traditional import droop_control_law, droop_solve, opf_solve


def _high_pv_point(env):
    """An operating point with heavy PV injection -> overvoltage risk."""
    ts = env.ts
    t = int(jnp.argmax(jnp.sum(ts.pv, axis=1)))
    return ts.load_p[t] * 0.5, ts.load_q[t] * 0.5, ts.pv[t]


def test_droop_law_shape():
    s = jnp.asarray([1.0])
    p = jnp.asarray([0.6])
    q_max = float(jnp.sqrt(1 - 0.36))
    # saturation regions
    np.testing.assert_allclose(
        float(droop_control_law(jnp.asarray([0.90]), p, s)[0]), q_max, rtol=1e-6)
    np.testing.assert_allclose(
        float(droop_control_law(jnp.asarray([1.10]), p, s)[0]), -q_max, rtol=1e-6)
    # dead zone
    assert float(droop_control_law(jnp.asarray([1.0]), p, s)[0]) == 0.0
    # linear ramps: halfway points
    np.testing.assert_allclose(
        float(droop_control_law(jnp.asarray([0.975]), p, s)[0]), q_max / 2, rtol=1e-5)
    np.testing.assert_allclose(
        float(droop_control_law(jnp.asarray([1.025]), p, s)[0]), -q_max / 2, rtol=1e-5)


def test_droop_reduces_overvoltage():
    env = make_env("case33", EnvConfig(), days=8, dtype=jnp.float64)
    lp, lq, pv = _high_pv_point(env)
    res_nc = env._solve(lp, lq, pv, jnp.zeros_like(pv))
    q, res, it = droop_solve(env, lp, lq, pv)
    assert bool(res.converged)
    v_max_nc = float(jnp.max(res_nc.vm))
    v_max_droop = float(jnp.max(res.vm))
    assert v_max_droop <= v_max_nc + 1e-9
    # overvoltage -> droop absorbs vars (negative q) at the worst buses
    if v_max_nc > 1.0:
        assert float(jnp.min(q)) < 0.0


def test_opf_beats_no_control():
    env = make_env("case33", EnvConfig(), days=8, dtype=jnp.float64)
    lp, lq, pv = _high_pv_point(env)
    q, res, trace = opf_solve(env, lp, lq, pv, steps=60)
    assert bool(res.converged)
    # objective decreased over the optimization
    assert float(trace[-1]) <= float(trace[0]) + 1e-9
    # q respects capacity
    cap = np.sqrt(np.maximum(np.asarray(env.ts.s_max)**2 - np.asarray(pv)**2, 0))
    assert np.all(np.abs(np.asarray(q)) <= cap + 1e-9)
    # voltage band violations no worse than no control
    res_nc = env._solve(lp, lq, pv, jnp.zeros_like(pv))
    viol = lambda r: float(jnp.sum(jnp.maximum(r.vm - 1.05, 0) ** 2
                                   + jnp.maximum(0.95 - r.vm, 0) ** 2))
    assert viol(res) <= viol(res_nc) + 1e-12
