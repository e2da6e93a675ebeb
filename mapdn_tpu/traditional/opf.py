"""Reactive-power OPF baseline via differentiable power flow (TPU-native).

Re-design of the reference's MATPOWER OPF baseline
(reference traditional_control/opf_matpower_all.m): per operating point,
choose each inverter's q within +-sqrt(S^2 - P^2) (P fixed, :78-79) to
minimize network loss subject to voltage limits.  MATPOWER solves this with
an interior-point NLP per instant on the host; here the same problem is
solved for *batches* of instants at once by projected gradient descent
through a differentiable fixed-iteration Newton power flow (lax.scan, so
reverse-mode AD applies), with a quadratic voltage-violation penalty —
the natural formulation on an accelerator with autodiff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from mapdn_tpu.pf.newton import _currents, _mm


def _fixed_iter_pf(grid, p_inj, q_inj, n_iter=8):
    """Differentiable power flow: fixed-count preconditioned chord/Newton
    iterations (reverse-AD-friendly, unlike the production while_loop)."""
    n = grid.g_mat.shape[0]
    dtype = grid.g_mat.dtype
    batch_shape = p_inj.shape[:-1]

    y_diag = jnp.sqrt(jnp.diagonal(grid.g_mat) ** 2 + jnp.diagonal(grid.b_mat) ** 2)
    inv_c = 1.0 / jnp.max(y_diag)
    g = grid.g_mat * inv_c
    b = grid.b_mat * inv_c
    rsg = grid.rowsum_g * inv_c
    rsb = grid.rowsum_b * inv_c
    w = grid.j0_inv / inv_c
    p_spec = (p_inj * inv_c)[..., 1:]
    q_spec = (q_inj * inv_c)[..., 1:]

    vm0 = jnp.ones(batch_shape + (n,), dtype).at[..., 0].set(
        grid.slack_vm.astype(dtype))
    va0 = jnp.zeros(batch_shape + (n,), dtype)

    def body(carry, _):
        vm, va = carry
        e = vm * jnp.cos(va)
        f = vm * jnp.sin(va)
        ir, ii = _currents(g, b, rsg, rsb, e, f)
        p = e * ir + f * ii
        q = f * ir - e * ii
        fvec = jnp.concatenate(
            [p_spec - p[..., 1:], q_spec - q[..., 1:]], axis=-1)
        dx = _mm(fvec, w)
        va = va.at[..., 1:].add(dx[..., : n - 1])
        vm = vm.at[..., 1:].multiply(1.0 + dx[..., n - 1:])
        return (vm, va), None

    (vm, va), _ = jax.lax.scan(body, (vm0, va0), None, length=n_iter)
    return vm, va


def opf_solve(env, load_p, load_q, pv_p, *, steps=150, lr=0.05,
              penalty=200.0, n_pf_iter=8):
    """Batched VAR OPF: min total loss s.t. v in [v_lower, v_upper],
    |q| <= sqrt(s_max^2 - p^2).

    Returns (sgen_q, PFResult-final, objective_trace).
    """
    from mapdn_tpu.pf.newton import branch_results, nr_solve

    grid, cfg = env.grid, env.cfg
    q_cap = jnp.sqrt(jnp.maximum(env.ts.s_max**2 - pv_p**2, 0.0))

    def objective(q):
        p_inj, q_inj = env._injections(load_p, load_q, pv_p, q)
        vm, va = _fixed_iter_pf(grid, p_inj, q_inj, n_iter=n_pf_iter)
        pl, _ = branch_results(grid, vm, va)
        loss = jnp.sum(pl, axis=-1)
        viol = (jnp.maximum(vm - cfg.v_upper, 0.0) ** 2
                + jnp.maximum(cfg.v_lower - vm, 0.0) ** 2)
        obj = loss + penalty * jnp.sum(viol, axis=-1)
        return jnp.sum(obj)

    tx = optax.adam(lr)

    def step(carry, _):
        q, opt = carry
        g = jax.grad(objective)(q)
        upd, opt = tx.update(g, opt, q)
        q = jnp.clip(q + upd * q_cap, -q_cap, q_cap)  # scaled + projected
        return (q, opt), objective(q)

    q0 = jnp.zeros_like(pv_p)
    (q, _), trace = jax.lax.scan(step, (q0, tx.init(q0)), None, length=steps)
    res = nr_solve(grid, *env._injections(load_p, load_q, pv_p, q),
                   tol=cfg.pf_tol, max_iter=cfg.pf_max_iter)
    return q, res, trace
