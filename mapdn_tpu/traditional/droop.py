"""Volt-var droop control baseline (TPU-native).

Re-design of the reference's Matlab/MATPOWER droop baseline
(reference traditional_control/pf_droop_matpower_all.m): the piecewise
volt-var law (:196-230) and the damped fixed-point iteration of
(power flow -> local droop response) with gain 0.1 up to 100 iterations
(:18-19, 120-150).  Here the whole fixed point runs as one jitted
lax.while_loop over *batches* of operating points, so a full day of droop
baselines across thousands of scenarios is a single device call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mapdn_tpu.pf.newton import nr_solve


def droop_control_law(v, p, s_rated, q_max_manual=None,
                      va=0.95, vb=1.0, vc=1.0, vd=1.05):
    """Piecewise volt-var curve (reference pf_droop_matpower_all.m:196-230).

    Saturated at +-q_max outside [va, vd], dead zone in [vb, vc], linear
    ramps between.  All args broadcastable; pure elementwise.
    """
    q_max = jnp.sqrt(jnp.maximum(s_rated**2 - p**2, 0.0))
    if q_max_manual is not None:
        q_max = jnp.minimum(q_max, q_max_manual)
    # low ramp: 0 at vb down-scaling to +q_max at va
    k_low = q_max / (va - vb)
    q_low = k_low * (v - vb)
    # high ramp: 0 at vc to -q_max at vd
    k_high = -q_max / (vc - vd)
    q_high = k_high * (vc - v)
    q = jnp.where(v <= va, q_max,
        jnp.where(v > vd, -q_max,
        jnp.where(jnp.logical_and(v >= vb, v <= vc), jnp.zeros_like(q_max),
        jnp.where(v < vb, q_low, q_high))))
    return q


def droop_solve(env, load_p, load_q, pv_p, *, gain=0.1, max_ite=100,
                v_tol=1e-4, reactive_ratio=1.0):
    """Batched droop fixed point for given operating points.

    Args shaped (..., n_load)/(..., n_sgen) [MW/Mvar].  Returns
    (sgen_q, PFResult, n_iter): the converged droop reactive dispatch and
    the final power-flow solution.
    """
    grid, ts = env.grid, env.ts
    s_rated = ts.s_max
    q_max_manual = reactive_ratio * s_rated

    q0 = jnp.zeros_like(pv_p)
    res0 = env._solve(load_p, load_q, pv_p, q0)
    v_pv_last = jnp.full_like(pv_p, 100.0)  # pass the first break check

    def cond(carry):
        q, v_pv_last, res, it = carry
        dv = jnp.sqrt(jnp.sum((res.vm[..., grid.sgen_bus] - v_pv_last) ** 2,
                              axis=-1))
        return jnp.logical_and(it < max_ite, jnp.any(dv >= v_tol))

    def body(carry):
        q, v_pv_last, res, it = carry
        v_pv = res.vm[..., grid.sgen_bus]
        q_new = droop_control_law(v_pv, pv_p, s_rated, q_max_manual,
                                  va=env.cfg.v_lower, vd=env.cfg.v_upper)
        q_next = (1.0 - gain) * q + gain * q_new
        res_next = env._solve(load_p, load_q, pv_p, q_next,
                              vm0=res.vm, va0=res.va)
        return q_next, v_pv, res_next, it + 1

    q, _, res, it = jax.lax.while_loop(
        cond, body, (q0, v_pv_last, res0, jnp.asarray(0, jnp.int32)))
    return q, res, it
