"""Batched Newton-Raphson AC power flow in pure real arithmetic (JAX).

This is the TPU-native replacement for the per-step ``pandapower.runpp`` call
the reference makes inside every ``env.step``/``env.reset``
(reference voltage_control_env.py:124,165,557) — the dominant cost of the
whole benchmark (SURVEY.md section 3.5).

Design: **matrix-free inexact Newton, no on-device factorization.**
TPU has no fast (or accurate: measured 3e-2 residuals in f32) batched LU, so
instead of assembling and factoring the polar Jacobian per iteration we

1. precompute the *flat-start* Jacobian inverse ``W = J0^-1`` once per grid
   in float64 on the host (Grid.j0_inv; J0 is injection-independent),
2. solve each Newton system ``J dx = F`` by preconditioned Richardson
   iteration:  ``dx <- dx + W (F - J dx)``, with ``J dx`` applied
   *matrix-free* as a directional derivative of the mismatch equations,
3. which makes every NR iteration a handful of (batch, n) x (n, n) matmuls
   — exactly the shape the MXU wants — with no (batch, n, n) Jacobian
   tensors in HBM at all.

Voltages live in rectangular coordinates (e = Vm cos Va, f = Vm sin Va);
mismatch and its directional derivative are:

    Ir = G e - B f            Ii = G f + B e
    P  = e Ir + f Ii          Q  = f Ir - e Ii
    de = -f dth + e dnu       df = e dth + f dnu      (dnu = dVm/Vm)
    dP = de Ir + e dIr + df Ii + f dIi                (dI* = Y dV parts)
    dQ = df Ir + f dIr - de Ii - e dIi

**Convergence mask, no exceptions**: ``pp.runpp`` raises ``ppException`` on
divergence; under jit nothing can raise, so the solver returns a per-lane
``converged`` flag which the environment maps to the reference's
-200-reward / rollback / terminate semantics
(reference voltage_control_env.py:183-196).

Bus 0 must be the slack bus (build-time invariant of mapdn_tpu.grid).
``nr_solve_dense`` keeps the classical explicit-Jacobian + LU path for
float64 oracle-parity tests on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PFResult:
    vm: jnp.ndarray          # (..., n_bus) voltage magnitude [pu]
    va: jnp.ndarray          # (..., n_bus) voltage angle [rad]
    p_bus: jnp.ndarray       # (..., n_bus) bus active power, consumption>0 [MW]
    q_bus: jnp.ndarray       # (..., n_bus) bus reactive power, consumption>0 [Mvar]
    pl_mw: jnp.ndarray       # (..., n_branch) per-branch active loss [MW]
    loading: jnp.ndarray     # (..., n_branch) loading percent of max_i_ka
    converged: jnp.ndarray   # (...,) bool
    n_iter: jnp.ndarray      # (...,) int32


_HI = jax.lax.Precision.HIGHEST


def _mm(x, m):
    """(..., n) x (n, n)^T matmul at full float32 precision.

    TPU f32 matmuls default to bf16 passes; with Ybus entries O(1e3 pu) and
    mismatches O(1e-4 pu) the solver needs every f32 bit."""
    return jnp.matmul(x, m.T, precision=_HI)


def _currents(g_mat, b_mat, rowsum_g, rowsum_b, e, f):
    """Ir, Ii = Re/Im(Ybus V), cancellation-safe.

    Feeder Ybus rows nearly cancel against near-flat voltages, so G e is a
    sum of O(|Y|) terms yielding O(1). Computing G (e-1) + rowsum_g keeps
    every intermediate O(|e-1| * |G|) instead, worth ~100x accuracy in
    float32 (rowsums are exact, carried from float64 at grid build)."""
    e1 = e - 1.0
    ir = _mm(e1, g_mat) - _mm(f, b_mat) + rowsum_g
    ii = _mm(f, g_mat) + _mm(e1, b_mat) + rowsum_b
    return ir, ii


def _calc_pq(grid, e, f):
    """P, Q from rectangular voltages (physical pu units). (..., n)."""
    ir, ii = _currents(grid.g_mat, grid.b_mat, grid.rowsum_g, grid.rowsum_b, e, f)
    p = e * ir + f * ii
    q = f * ir - e * ii
    return p, q


def nr_solve(grid, p_inj, q_inj, *, tol=1e-7, max_iter=20, inner_iters=3,
             vm0=None, va0=None):
    """Batched matrix-free NR solve.

    Args:
      p_inj/q_inj: (..., n_bus) net injections [pu], generation positive;
        slack-bus entries ignored.
      tol: max |power mismatch| [pu] declaring convergence (float32 default;
        use ~1e-8 under float64 for pandapower-grade parity).
      inner_iters: Richardson refinement steps per Newton direction; 0 means
        a pure chord/Picard step with the frozen flat-start preconditioner.

    Flat start by default (pandapower's ``init='auto'`` resolves to a flat
    start for PQ-only distribution nets).  Result fields follow pandapower's
    res_bus sign convention (consumption positive) and units (MW/Mvar/%).

    Internally the system is solved in *Y-normalized units*: (Y, S) are
    jointly scaled by 1/max|y_diag| (the voltage solution is invariant under
    this), which (a) keeps the f32 mismatch floor ~1e-8 regardless of how
    stiff the network is, and (b) turns ``tol`` into an approximately
    voltage-scale quantity, uniform across grids.
    """
    n = grid.g_mat.shape[0]
    batch_shape = p_inj.shape[:-1]
    dtype = grid.g_mat.dtype

    y_diag = jnp.sqrt(jnp.diagonal(grid.g_mat) ** 2 + jnp.diagonal(grid.b_mat) ** 2)
    inv_c = 1.0 / jnp.max(y_diag)
    g_mat = grid.g_mat * inv_c
    b_mat = grid.b_mat * inv_c
    rowsum_g = grid.rowsum_g * inv_c
    rowsum_b = grid.rowsum_b * inv_c
    w_inv = grid.j0_inv / inv_c
    p_inj = p_inj * inv_c
    q_inj = q_inj * inv_c

    if vm0 is None:
        vm0 = jnp.ones(batch_shape + (n,), dtype)
        vm0 = vm0.at[..., 0].set(grid.slack_vm.astype(dtype))
    if va0 is None:
        va0 = jnp.zeros(batch_shape + (n,), dtype)
    e0 = vm0 * jnp.cos(va0)
    f0 = vm0 * jnp.sin(va0)

    p_spec = p_inj[..., 1:]
    q_spec = q_inj[..., 1:]
    # convergence is tested on mismatch relative to the lane's loading scale
    # (clipped at 1 pu so light-load lanes keep an absolute 'tol' test):
    # the f32 mismatch floor grows with |S|, an absolute test would falsely
    # flag heavy (but solvable) cases as diverged
    s_ref = jnp.maximum(jnp.maximum(
        jnp.max(jnp.abs(p_spec), axis=-1),
        jnp.max(jnp.abs(q_spec), axis=-1)), 1.0)

    def d_currents(de, df):
        # directional derivative of Ybus V: deltas are small, no shift needed
        ir = _mm(de, g_mat) - _mm(df, b_mat)
        ii = _mm(df, g_mat) + _mm(de, b_mat)
        return ir, ii

    def mismatch(e, f):
        ir, ii = _currents(g_mat, b_mat, rowsum_g, rowsum_b, e, f)
        p = e * ir + f * ii
        q = f * ir - e * ii
        return (jnp.concatenate(
            [p_spec - p[..., 1:], q_spec - q[..., 1:]], axis=-1), ir, ii)

    zero_pad = jnp.zeros(batch_shape + (1,), dtype)

    def jvp_apply(dx, e, f, ir, ii):
        """J @ dx (scaled-dVm polar Jacobian), matrix-free."""
        dth = jnp.concatenate([zero_pad, dx[..., : n - 1]], axis=-1)
        dnu = jnp.concatenate([zero_pad, dx[..., n - 1:]], axis=-1)
        de = -f * dth + e * dnu
        df = e * dth + f * dnu
        dir_, dii = d_currents(de, df)
        dp = de * ir + e * dir_ + df * ii + f * dii
        dq = df * ir + f * dir_ - de * ii - e * dii
        return jnp.concatenate([dp[..., 1:], dq[..., 1:]], axis=-1)

    def newton_dir(fvec, e, f, ir, ii):
        dx = _mm(fvec, w_inv)
        for _ in range(inner_iters):
            r = fvec - jvp_apply(dx, e, f, ir, ii)
            dx = dx + _mm(r, w_inv)
        return dx

    def cond(carry):
        vm, va, done, it = carry
        return jnp.logical_and(it < max_iter, ~jnp.all(done))

    def body(carry):
        vm, va, done, it = carry
        e = vm * jnp.cos(va)
        f = vm * jnp.sin(va)
        fvec, ir, ii = mismatch(e, f)
        dx = newton_dir(fvec, e, f, ir, ii)

        upd = jnp.where(done[..., None], 0.0, dx)
        va_new = va.at[..., 1:].add(upd[..., : n - 1])
        vm_new = vm.at[..., 1:].multiply(1.0 + upd[..., n - 1:])

        fnew, _, _ = mismatch(vm_new * jnp.cos(va_new), vm_new * jnp.sin(va_new))
        err = jnp.max(jnp.abs(fnew), axis=-1) / s_ref
        bad = jnp.logical_or(~jnp.isfinite(err), jnp.max(vm_new, axis=-1) > 10.0)
        done_next = jnp.logical_or(done, jnp.logical_or(err < tol, bad))
        return vm_new, va_new, done_next, it + 1

    fvec0, _, _ = mismatch(e0, f0)
    done0 = jnp.max(jnp.abs(fvec0), axis=-1) / s_ref < tol
    it0 = jnp.asarray(0, jnp.int32)  # scalar: iterations of the slowest lane

    vm, va, done, it = jax.lax.while_loop(cond, body, (vm0, va0, done0, it0))
    it = jnp.broadcast_to(it, batch_shape)

    ffin, _, _ = mismatch(vm * jnp.cos(va), vm * jnp.sin(va))
    err = jnp.max(jnp.abs(ffin), axis=-1) / s_ref
    converged = jnp.logical_and(err < tol, jnp.isfinite(err))

    p_bus, q_bus = bus_injections(grid, vm, va)
    pl_mw, loading = branch_results(grid, vm, va)
    return PFResult(
        vm=vm, va=va, p_bus=p_bus, q_bus=q_bus, pl_mw=pl_mw,
        loading=loading, converged=converged, n_iter=it)


def nr_solve_dense(grid, p_inj, q_inj, *, tol=1e-8, max_iter=20,
                   vm0=None, va0=None):
    """Classical explicit-Jacobian NR with batched LU (float64/CPU path).

    Kept for oracle-grade parity testing; the matrix-free :func:`nr_solve`
    is the production TPU path.
    """
    g_mat, b_mat = grid.g_mat, grid.b_mat
    n = g_mat.shape[0]
    batch_shape = p_inj.shape[:-1]
    dtype = g_mat.dtype

    if vm0 is None:
        vm0 = jnp.ones(batch_shape + (n,), dtype)
        vm0 = vm0.at[..., 0].set(grid.slack_vm.astype(dtype))
    if va0 is None:
        va0 = jnp.zeros(batch_shape + (n,), dtype)

    eye2 = jnp.eye(2 * (n - 1), dtype=dtype)
    diag_idx = jnp.arange(n - 1)

    def mismatch(vm, va):
        e = vm * jnp.cos(va)
        f = vm * jnp.sin(va)
        p, q = _calc_pq(grid, e, f)
        return jnp.concatenate(
            [p_inj[..., 1:] - p[..., 1:], q_inj[..., 1:] - q[..., 1:]], axis=-1)

    def cond(carry):
        vm, va, done, it = carry
        return jnp.logical_and(it < max_iter, ~jnp.all(done))

    def body(carry):
        vm, va, done, it = carry
        e = vm * jnp.cos(va)
        f = vm * jnp.sin(va)
        gE = g_mat * e[..., None, :]
        gF = g_mat * f[..., None, :]
        bE = b_mat * e[..., None, :]
        bF = b_mat * f[..., None, :]
        x1 = gE - bF
        x2 = gF + bE
        amat = e[..., :, None] * x1 + f[..., :, None] * x2
        b2mat = f[..., :, None] * x1 - e[..., :, None] * x2
        p = jnp.sum(amat, axis=-1)
        q = jnp.sum(b2mat, axis=-1)

        fvec = jnp.concatenate(
            [p_inj[..., 1:] - p[..., 1:], q_inj[..., 1:] - q[..., 1:]], axis=-1)

        a_nn = amat[..., 1:, 1:]
        b_nn = b2mat[..., 1:, 1:]
        dg_p = jnp.zeros_like(a_nn).at[..., diag_idx, diag_idx].set(p[..., 1:])
        dg_q = jnp.zeros_like(a_nn).at[..., diag_idx, diag_idx].set(q[..., 1:])
        jac = jnp.concatenate(
            [jnp.concatenate([b_nn - dg_q, a_nn + dg_p], axis=-1),
             jnp.concatenate([-a_nn + dg_p, b_nn + dg_q], axis=-1)], axis=-2)

        jac = jnp.where(done[..., None, None], eye2, jac)
        dx = jnp.linalg.solve(jac, fvec[..., None])[..., 0]

        va_new = va.at[..., 1:].add(jnp.where(done[..., None], 0.0, dx[..., : n - 1]))
        vm_new = vm.at[..., 1:].multiply(
            jnp.where(done[..., None], 1.0, 1.0 + dx[..., n - 1:]))

        err = jnp.max(jnp.abs(mismatch(vm_new, va_new)), axis=-1)
        bad = jnp.logical_or(~jnp.isfinite(err), jnp.max(vm_new, axis=-1) > 10.0)
        done_next = jnp.logical_or(done, jnp.logical_or(err < tol, bad))
        return vm_new, va_new, done_next, it + 1

    done0 = jnp.max(jnp.abs(mismatch(vm0, va0)), axis=-1) < tol
    vm, va, done, it = jax.lax.while_loop(
        cond, body, (vm0, va0, done0, jnp.asarray(0, jnp.int32)))
    it = jnp.broadcast_to(it, batch_shape)

    err = jnp.max(jnp.abs(mismatch(vm, va)), axis=-1)
    converged = jnp.logical_and(err < tol, jnp.isfinite(err))

    p_bus, q_bus = bus_injections(grid, vm, va)
    pl_mw, loading = branch_results(grid, vm, va)
    return PFResult(
        vm=vm, va=va, p_bus=p_bus, q_bus=q_bus, pl_mw=pl_mw,
        loading=loading, converged=converged, n_iter=it)


def bus_injections(grid, vm, va):
    """res_bus-equivalent bus powers [MW/Mvar], consumption positive.

    pandapower's ``res_bus.p_mw`` reports consumption as positive
    (generation negative); the computed net injection (gen>0) is negated.
    """
    e = vm * jnp.cos(va)
    f = vm * jnp.sin(va)
    p, q = _calc_pq(grid, e, f)
    return -p * grid.sn_mva, -q * grid.sn_mva


def branch_results(grid, vm, va):
    """Per-branch active loss [MW] and loading percent from solved voltages."""
    e = vm * jnp.cos(va)
    f = vm * jnp.sin(va)
    ef = e[..., grid.f_bus]
    ff = f[..., grid.f_bus]
    et = e[..., grid.t_bus]
    ft = f[..., grid.t_bus]

    ysg, ysb = grid.ys_g, grid.ys_b
    bc = grid.br_b / 2.0
    t = grid.tap

    # yff = (ys + j bc) / t^2 ; yft = -ys / t ; ytt = ys + j bc ; ytf = -ys / t
    yffg, yffb = ysg / t**2, (ysb + bc) / t**2
    yftg, yftb = -ysg / t, -ysb / t
    yttg, yttb = ysg, ysb + bc

    # i_f = yff vf + yft vt (complex, expanded)
    ifr = yffg * ef - yffb * ff + yftg * et - yftb * ft
    ifi = yffg * ff + yffb * ef + yftg * ft + yftb * et
    itr = yttg * et - yttb * ft + yftg * ef - yftb * ff
    iti = yttg * ft + yttb * et + yftg * ff + yftb * ef

    p_f = ef * ifr + ff * ifi
    p_t = et * itr + ft * iti
    pl_mw = (p_f + p_t) * grid.sn_mva

    i_f = jnp.sqrt(ifr**2 + ifi**2)
    i_t = jnp.sqrt(itr**2 + iti**2)
    # base current on the from-bus voltage level: I_base[kA] = S/(sqrt3 * V)
    i_base = grid.sn_mva / (jnp.sqrt(jnp.asarray(3.0, vm.dtype)) * grid.vn_kv[grid.f_bus])
    i_ka = jnp.maximum(i_f, i_t) * i_base
    loading = i_ka / grid.max_i_ka * 100.0
    return pl_mw, loading
