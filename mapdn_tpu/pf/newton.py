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


def _mp(x, m):
    """Plain (..., 2n) x (2n, 2n) matmul at full f32 precision (packed
    operators are built pre-transposed, pallas_nr-style)."""
    return jnp.matmul(x, m, precision=_HI)


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
             vm0=None, va0=None, fixed_iter=None):
    """Batched matrix-free NR solve.

    Args:
      p_inj/q_inj: (..., n_bus) net injections [pu], generation positive;
        slack-bus entries ignored.
      tol: max |power mismatch| [pu] declaring convergence (float32 default;
        use ~1e-8 under float64 for pandapower-grade parity).
      inner_iters: Richardson refinement steps per Newton direction; 0 means
        a pure chord/Picard step with the frozen flat-start preconditioner.
      fixed_iter: if set, run exactly this many UNROLLED Newton iterations
        (per-lane masked freeze once converged) instead of a
        ``lax.while_loop`` with early exit.  Same fixed point, same
        convergence test; lanes needing more than ``fixed_iter`` iterations
        report ``converged=False`` (pandapower's own NR caps at 10).  Why:
        an XLA While op is a scheduling barrier — nothing overlaps across
        it — so inside a fused rollout the surrounding policy/obs work
        serializes against every solve.  Straight-line iterations let XLA
        pipeline the whole step (round-4 ablation: policy costs 14 ms alone
        but +37 ms when interleaved with the While-based solver).  The
        unrolled body also carries the mismatch between iterations (one
        evaluation per iteration; the While body needs two).

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

    # ---- packed complex operators (the Pallas kernel's layout, in XLA) ----
    # Every state vector is one (..., 2n) array of [real-half | imag-half];
    # slack handling is a mask, not concat/slice: at n=33 the old per-half
    # slicing ([..., 1:], zero-pad concats) forced a vector relayout per op,
    # and each iteration issued 2x the matmuls.  Grid arrays are jit
    # constants here, so the blocks fold at compile time.
    #   [Ir, Ii]   = [e-1, f]  @ ypack + rowsum     (currents)
    #   [dIr, dIi] = [de, df]  @ ypack              (directional currents)
    #   [dth, dnu] = [fP, fQ]  @ wpack              (preconditioner)
    # (pre-transposed blocks, exactly as PallasNRContext builds them:
    #  (x @ G^T)_j = sum_i G[j,i] x_i = (G x)_j)
    ypack = jnp.block([[g_mat.T, b_mat.T], [-b_mat.T, g_mat.T]])
    w = grid.j0_inv / inv_c
    m = n - 1
    zpad = jnp.zeros((n, n), dtype)
    wb = {}
    for name, (r, c) in {"tp": (0, 0), "tq": (0, 1),
                         "np": (1, 0), "nq": (1, 1)}.items():
        wb[name] = zpad.at[1:, 1:].set(w[r * m:(r + 1) * m, c * m:(c + 1) * m]).T
    wpack = jnp.block([[wb["tp"], wb["np"]], [wb["tq"], wb["nq"]]])
    rowsum = jnp.concatenate([grid.rowsum_g, grid.rowsum_b]) * inv_c
    mask = jnp.concatenate([
        jnp.zeros((1,), dtype).at[0].set(0.0),
        jnp.ones((n - 1,), dtype)])
    mask = jnp.concatenate([mask, mask])          # (2n,) PQ-bus mask

    spec = jnp.concatenate([p_inj, q_inj], axis=-1) * (inv_c * mask)

    if vm0 is None:
        vm0 = jnp.ones(batch_shape + (n,), dtype)
        vm0 = vm0.at[..., 0].set(grid.slack_vm.astype(dtype))
    if va0 is None:
        va0 = jnp.zeros(batch_shape + (n,), dtype)
    # packed rectangular state [e, f]
    v0 = jnp.concatenate([vm0 * jnp.cos(va0), vm0 * jnp.sin(va0)], axis=-1)

    # convergence is tested on mismatch relative to the lane's loading scale
    # (clipped at 1 pu so light-load lanes keep an absolute 'tol' test):
    # the f32 mismatch floor grows with |S|, an absolute test would falsely
    # flag heavy (but solvable) cases as diverged
    s_ref = jnp.maximum(jnp.max(jnp.abs(spec), axis=-1), 1.0)

    base = jnp.concatenate([jnp.ones((n,), dtype), jnp.zeros((n,), dtype)])

    def split(x):
        return x[..., :n], x[..., n:]

    def join(a, b):
        return jnp.concatenate([a, b], axis=-1)

    def mismatch(v):
        # cancellation-safe currents: Y (v - flat) + exact rowsums (see
        # _currents); one packed matmul instead of four half matmuls
        cur = _mp(v - base, ypack) + rowsum
        e, f = split(v)
        ir, ii = split(cur)
        pq = join(e * ir + f * ii, f * ir - e * ii)
        return (spec - pq) * mask, cur

    def newton_dir(fvec, v, cur):
        e, f = split(v)
        ir, ii = split(cur)
        d = _mp(fvec, wpack)
        for _ in range(inner_iters):
            dth, dnu = split(d)
            de = -f * dth + e * dnu
            df = e * dth + f * dnu
            dcur = _mp(join(de, df), ypack)
            dir_, dii = split(dcur)
            jv = join(de * ir + e * dir_ + df * ii + f * dii,
                      df * ir + f * dir_ - de * ii - e * dii) * mask
            d = d + _mp(fvec - jv, wpack)
        return d

    def apply_update(v, d, gate):
        # va += dth, vm *= (1 + dnu), in rectangular form:
        # v' = vm (1+dnu) [cos(va+dth), sin(va+dth)]; slack rows have
        # d == 0 by wpack construction, gate freezes converged lanes
        e, f = split(v)
        dth, dnu = split(d)
        cos_d = jnp.cos(gate * dth)
        sin_d = jnp.sin(gate * dth)
        scale = 1.0 + gate * dnu
        return join(scale * (e * cos_d - f * sin_d),
                    scale * (f * cos_d + e * sin_d))

    def err_of(fvec):
        return jnp.max(jnp.abs(fvec), axis=-1) / s_ref

    def vm_sq_max(v):
        e, f = split(v)
        return jnp.max(e * e + f * f, axis=-1)

    fvec0, cur0 = mismatch(v0)
    err0 = err_of(fvec0)
    done0 = err0 < tol

    if fixed_iter is not None:
        # straight-line path: fixed_iter unrolled masked iterations — no
        # While op, so XLA can pipeline the surrounding program through
        # the solver (an XLA While is a scheduling barrier)
        v, fvec, cur, done = v0, fvec0, cur0, done0
        it = jnp.zeros(batch_shape, jnp.int32)
        for _ in range(fixed_iter):
            d = newton_dir(fvec, v, cur)
            gate = 1.0 - done[..., None].astype(dtype)
            v = apply_update(v, d, gate)
            it = it + jnp.where(done, 0, 1)
            fvec, cur = mismatch(v)
            err = err_of(fvec)
            bad = jnp.logical_or(~jnp.isfinite(err), vm_sq_max(v) > 100.0)
            done = jnp.logical_or(done, jnp.logical_or(err < tol, bad))
    else:
        def cond(carry):
            v, fvec, cur, done, it, it_l = carry
            return jnp.logical_and(it < max_iter, ~jnp.all(done))

        def body(carry):
            v, fvec, cur, done, it, it_l = carry
            d = newton_dir(fvec, v, cur)
            gate = 1.0 - done[..., None].astype(dtype)
            v2 = apply_update(v, d, gate)
            # per-lane count: lanes already done at iteration start don't
            # advance — same semantics as the fixed_iter path and the small
            # Pallas kernel, so n_iter telemetry is backend-consistent
            it_l = it_l + jnp.where(done, 0, 1)
            fvec2, cur2 = mismatch(v2)
            err = err_of(fvec2)
            bad = jnp.logical_or(~jnp.isfinite(err), vm_sq_max(v2) > 100.0)
            done2 = jnp.logical_or(done, jnp.logical_or(err < tol, bad))
            return v2, fvec2, cur2, done2, it + 1, it_l

        v, fvec, cur, done, _, it = jax.lax.while_loop(
            cond, body, (v0, fvec0, cur0, done0, jnp.asarray(0, jnp.int32),
                         jnp.zeros(batch_shape, jnp.int32)))

    err = err_of(fvec)
    converged = jnp.logical_and(err < tol, jnp.isfinite(err))
    e, f = split(v)
    vm = jnp.sqrt(e * e + f * f)
    va = jnp.arctan2(f, e)

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
