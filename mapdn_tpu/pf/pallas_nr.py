"""Pallas TPU kernel: whole-solve batched Newton-Raphson power flow in VMEM.

The pure-JAX matrix-free solver (:mod:`mapdn_tpu.pf.newton`) already casts
every NR iteration as (batch, n) x (n, n) matmuls, but under XLA each of the
~50 small ops per iteration round-trips (batch, n) operands through HBM and
the while-loop body is scheduled op-by-op.  For the benchmark grids
(n = 33..322) the matrices + a batch tile fit comfortably in VMEM (~16 MB),
so this kernel runs the ENTIRE Newton loop — mismatch, frozen-preconditioner
Richardson refinement, masked update, convergence test — inside one
``pallas_call``: HBM traffic collapses to one read of (p, q, v0) and one
write of (vm, va, err) per solve, everything else stays on-chip.

Same algorithm and Y-normalization as :func:`mapdn_tpu.pf.newton.nr_solve`
(see that module's docstring for the math and the reference citations: this
replaces the per-step ``pandapower.runpp`` of reference
voltage_control_env.py:124,165,557).  Kernel-specific restructurings:

* complex arithmetic is PACKED: state vectors carry [real | imag] halves in
  one (tile, 2N) array and the Ybus/preconditioner act as single (2N, 2N)
  block matrices — one big MXU matmul where the XLA path issues four small
  ones;
* the slack row/col and lane padding are a bus mask, not concat/slicing;
* the loop carries the current iterate's mismatch/currents, so each
  iteration evaluates the mismatch once (the XLA path evaluates twice);
* only the mismatch matmul runs at full f32 precision (it defines the
  solution and the convergence test); the Newton-direction matmuls
  (preconditioner + JVP) use default bf16-pass precision — they only steer
  the step, so direction noise costs at most an extra iteration.

``nr_solve_pallas`` is a drop-in for ``nr_solve`` on batched inputs.
``make_auto_solver`` wraps both behind ``jax.custom_batching.custom_vmap``
so per-lane env code under ``vmap`` transparently dispatches to this kernel
on TPU and to the XLA path elsewhere (CPU tests, interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mapdn_tpu.pf.newton import PFResult, branch_results, bus_injections, nr_solve

_HI = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return -(-x // m) * m


class PallasNRContext:
    """Padded, Y-normalized, packed operands for one grid.

    Held as host numpy arrays: they enter each jit trace as fresh
    constants, so one cached context is safely shared across traces."""

    def __init__(self, grid):
        n = grid.n_bus
        npad = _round_up(max(n, 128), 128)
        g64 = np.asarray(grid.g_mat, np.float64)
        b64 = np.asarray(grid.b_mat, np.float64)
        y_diag = np.sqrt(np.diag(g64) ** 2 + np.diag(b64) ** 2)
        inv_c = 1.0 / float(np.max(y_diag))
        gs, bs = g64 * inv_c, b64 * inv_c

        def pad(m):
            out = np.zeros((npad, npad), np.float64)
            out[:n, :n] = m
            return out

        # packed current operator: [e1, f] @ Y -> [Ir, Ii] (pre-transposed
        # blocks: (x @ G^T)_i = sum_j G[i,j] x_j)
        ypack = np.block([[pad(gs.T), pad(bs.T)],
                          [pad(-bs.T), pad(gs.T)]])
        self.ypack = ypack.astype(np.float32)

        # packed preconditioner: [fP, fQ] @ W -> [dtheta, dnu]
        w = np.asarray(grid.j0_inv, np.float64) / inv_c
        m = n - 1
        blk = {}
        for name, (r, c) in {"tp": (0, 0), "tq": (0, 1),
                             "np": (1, 0), "nq": (1, 1)}.items():
            full = np.zeros((npad, npad), np.float64)
            full[1:n, 1:n] = w[r * m:(r + 1) * m, c * m:(c + 1) * m]
            blk[name] = full.T
        wpack = np.block([[blk["tp"], blk["np"]],
                          [blk["tq"], blk["nq"]]])
        self.wpack = wpack.astype(np.float32)

        rs = np.zeros((1, 2 * npad), np.float64)
        rs[0, :n] = np.asarray(grid.rowsum_g, np.float64) * inv_c
        rs[0, npad:npad + n] = np.asarray(grid.rowsum_b, np.float64) * inv_c
        self.rowsum = rs.astype(np.float32)

        mask = np.zeros((1, 2 * npad), np.float32)
        mask[0, 1:n] = 1.0            # PQ buses, P half
        mask[0, npad + 1:npad + n] = 1.0  # PQ buses, Q half
        self.mask = mask

        self.n = n
        self.npad = npad
        self.inv_c = inv_c
        self.slack_vm = float(grid.slack_vm)
        # batch tile sized so the ~8 (tile, 2*npad) live arrays + the two
        # (2*npad, 2*npad) matrices stay within the raised VMEM budget.
        # npad=384 (case322) measured r5: tile 256 = 2.04M solves/s vs
        # 1.88M at tile 64 (+8%) — the wider tile amortizes the operand
        # residency across more batch rows
        self.tile = {128: 512, 256: 256, 384: 256}.get(npad, 64)


def _grid_fingerprint(grid):
    """Stable cache key for a grid's solver operands.

    Hashes the exact inputs the contexts are built from (Y-bus, flat-start
    Jacobian inverse, slack rowsums, slack magnitude) — NOT id(grid): a
    recycled id after garbage collection must never alias a different
    grid's operators, and the key must stay valid for the process
    lifetime without pinning the grid object."""
    import hashlib
    h = hashlib.sha1()
    for arr in (grid.g_mat, grid.b_mat, grid.j0_inv,
                grid.rowsum_g, grid.rowsum_b):
        a = np.ascontiguousarray(np.asarray(arr, np.float64))
        h.update(a.tobytes())
        h.update(repr(a.shape).encode())
    h.update(repr((grid.name, int(grid.n_bus), float(grid.slack_vm))).encode())
    return h.hexdigest()


_CTX_CACHE = {}


def get_ctx(grid) -> PallasNRContext:
    key = _grid_fingerprint(grid)
    if key not in _CTX_CACHE:
        _CTX_CACHE[key] = PallasNRContext(grid)
    return _CTX_CACHE[key]


def _dot(x, m):
    """Full-f32 matmul: the mismatch (defines solution + convergence)."""
    return jax.lax.dot_general(
        x, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)


def _dot_fast(x, m):
    """Default-precision matmul: Newton direction only (steers the step)."""
    return jax.lax.dot_general(
        x, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _nr_kernel(spec_ref, v0_ref, ypack_ref, wpack_ref, rs_ref, mask_ref,
               v_out, err_out, it_out, *, tol, max_iter, inner_iters, npad):
    """One batch tile.  Packed layout: every (tile, 2*npad) array is
    [real-half | imag-half]; ``spec`` holds [P_spec, Q_spec], ``v`` holds
    [e, f], currents hold [Ir, Ii], mismatch holds [fP, fQ], direction
    holds [dtheta, dnu]."""
    mask = mask_ref[:]
    ypack = ypack_ref[:]
    wpack = wpack_ref[:]
    rowsum = rs_ref[:]
    spec = spec_ref[:] * mask

    def split(x):
        return x[:, :npad], x[:, npad:]

    def join(a, b):
        return jnp.concatenate([a, b], axis=1)

    s_ref = jnp.maximum(jnp.max(jnp.abs(spec), axis=-1, keepdims=True), 1.0)

    def mismatch(v):
        e, f = split(v)
        cur = _dot(join(e - 1.0, f), ypack) + rowsum   # [Ir, Ii]
        ir, ii = split(cur)
        pq = join(e * ir + f * ii, f * ir - e * ii)    # [P, Q]
        return (spec - pq) * mask, cur

    def newton_dir(fvec, v, cur):
        e, f = split(v)
        ir, ii = split(cur)
        d = _dot_fast(fvec, wpack)                     # [dtheta, dnu]
        for _ in range(inner_iters):
            dth, dnu = split(d)
            de = -f * dth + e * dnu
            df = e * dth + f * dnu
            dcur = _dot_fast(join(de, df), ypack)
            dir_, dii = split(dcur)
            jv = join(de * ir + e * dir_ + df * ii + f * dii,
                      df * ir + f * dir_ - de * ii - e * dii) * mask
            d = d + _dot_fast(fvec - jv, wpack)
        return split(d)

    v0 = v0_ref[:]
    fvec0, cur0 = mismatch(v0)
    err0 = jnp.max(jnp.abs(fvec0), axis=-1, keepdims=True) / s_ref
    # Mosaic can't carry i1 vectors through scf.while: done is a f32 mask,
    # the all-done test a scalar carried alongside
    done0 = jnp.where(err0 < tol, 1.0, 0.0)

    def cond(c):
        it, alldone = c[0], c[1]
        return jnp.logical_and(it < max_iter, alldone < 0.5)

    def body(c):
        it, _, v, fvec, cur, err, done, niter = c
        e, f = split(v)
        dth, dnu = newton_dir(fvec, v, cur)
        gate = 1.0 - done
        # per-lane iteration telemetry: count each iteration the lane was
        # still active (solver-health parity with the XLA path's n_iter)
        niter2 = niter + gate
        # va update by dth, vm update by (1 + dnu), in rectangular form:
        # v' = vm (1+dnu) [cos(va+dth), sin(va+dth)]
        cos_d = jnp.cos(gate * dth)
        sin_d = jnp.sin(gate * dth)
        scale = 1.0 + gate * dnu
        e2 = scale * (e * cos_d - f * sin_d)
        f2 = scale * (f * cos_d + e * sin_d)
        v2 = join(e2, f2)
        fvec2, cur2 = mismatch(v2)
        err2 = jnp.max(jnp.abs(fvec2), axis=-1, keepdims=True) / s_ref
        vm2sq = jnp.max(e2 * e2 + f2 * f2, axis=-1, keepdims=True)
        stop = jnp.logical_or(
            jnp.logical_or(~jnp.isfinite(err2), err2 < tol), vm2sq > 100.0)
        done2 = jnp.maximum(done, jnp.where(stop, 1.0, 0.0))
        return it + 1, jnp.min(done2), v2, fvec2, cur2, err2, done2, niter2

    out = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.min(done0), v0, fvec0, cur0,
         err0, done0, jnp.zeros_like(err0)))
    v_out[:] = out[2]
    err_out[:] = out[5]
    it_out[:] = out[7]


def nr_solve_pallas(grid, p_inj, q_inj, *, tol=1e-7, max_iter=20,
                    inner_iters=3, vm0=None, va0=None, interpret=False):
    """Batched NR solve on TPU via the fused Pallas kernel.

    Same contract as :func:`mapdn_tpu.pf.newton.nr_solve` (injections in pu,
    generation positive, bus 0 slack); requires a batched input (leading
    dims flattened internally).  ``interpret=True`` runs the kernel in the
    Pallas interpreter for CPU-side testing.
    """
    ctx = get_ctx(grid)
    n, npad = ctx.n, ctx.npad
    batch_shape = p_inj.shape[:-1]
    bsz = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    # shrink the batch tile for small batches (8-row min for f32 sublanes)
    # so a 64-lane solve doesn't pay for a 512-row tile of padding
    tile = min(ctx.tile, _round_up(bsz, 8))
    bpad = _round_up(max(bsz, tile), tile)
    dtype = jnp.float32

    spec = jnp.zeros((bpad, 2 * npad), dtype)
    spec = spec.at[:bsz, :n].set(
        p_inj.reshape(bsz, n).astype(dtype) * ctx.inv_c)
    spec = spec.at[:bsz, npad:npad + n].set(
        q_inj.reshape(bsz, n).astype(dtype) * ctx.inv_c)

    if vm0 is None:
        vm0b = jnp.full((bsz, n), 1.0, dtype).at[:, 0].set(ctx.slack_vm)
    else:
        vm0b = vm0.reshape(bsz, n).astype(dtype)
    va0b = (jnp.zeros((bsz, n), dtype) if va0 is None
            else va0.reshape(bsz, n).astype(dtype))
    # packed rectangular start [e, f]; padded region at flat 1+0j
    v0 = jnp.zeros((bpad, 2 * npad), dtype)
    v0 = v0.at[:, :npad].set(1.0)
    v0 = v0.at[:bsz, :n].set(vm0b * jnp.cos(va0b))
    v0 = v0.at[:bsz, npad:npad + n].set(vm0b * jnp.sin(va0b))

    kern = functools.partial(
        _nr_kernel, tol=tol, max_iter=max_iter, inner_iters=inner_iters,
        npad=npad)
    bspec = pl.BlockSpec((tile, 2 * npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((2 * npad, 2 * npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 2 * npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    # scoped-VMEM budget: Mosaic's default 16MB cap under-provisions the
    # npad=384 (case322) tile — the two packed (2*npad, 2*npad) matrices
    # alone are 2x2.36MB and stream double-buffered.  Budget them plus the
    # ~16 live (tile, 2*npad) loop arrays with headroom, capped well under
    # the chip's 128MB VMEM.
    mat_bytes = 2 * (2 * npad) * (2 * npad) * 4
    live_bytes = 24 * tile * (2 * npad) * 4
    # 16MB headroom: Mosaic's stack accounting charges loop temporaries and
    # per-grid-step double buffers beyond the nameable arrays (measured:
    # npad=384/tile=64 needs 21.6MiB where the nameable sum is ~14MiB)
    vmem_limit = min(2 * (mat_bytes + live_bytes) + (16 << 20), 100 << 20)

    v, err, it = pl.pallas_call(
        kern,
        grid=(bpad // tile,),
        in_specs=[bspec, bspec, mspec, mspec, vspec, vspec],
        out_specs=[bspec, espec, espec],
        out_shape=[jax.ShapeDtypeStruct((bpad, 2 * npad), dtype),
                   jax.ShapeDtypeStruct((bpad, 1), dtype),
                   jax.ShapeDtypeStruct((bpad, 1), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)),
        interpret=interpret,
    )(spec, v0, ctx.ypack, ctx.wpack, ctx.rowsum, ctx.mask)

    e = v[:bsz, :n].reshape(batch_shape + (n,))
    f = v[:bsz, npad:npad + n].reshape(batch_shape + (n,))
    vm = jnp.sqrt(e * e + f * f)
    va = jnp.arctan2(f, e)
    err = err[:bsz, 0].reshape(batch_shape)
    converged = jnp.logical_and(err < tol, jnp.isfinite(err))
    # per-lane iteration counts carried out of the kernel loop (the XLA
    # path reports the slowest lane's loop count broadcast; here each lane
    # reports the iterations it was itself active)
    n_iter = it[:bsz, 0].reshape(batch_shape).astype(jnp.int32)

    p_bus, q_bus = bus_injections(grid, vm, va)
    pl_mw, loading = branch_results(grid, vm, va)
    return PFResult(
        vm=vm, va=va, p_bus=p_bus, q_bus=q_bus, pl_mw=pl_mw,
        loading=loading, converged=converged, n_iter=n_iter)


class PallasNRSmallContext:
    """Transposed-layout operands for the small-grid kernel.

    Layout: the BUS axis lives on sublanes (padded to a multiple of 8) and
    the BATCH axis on lanes (padded to a multiple of 128).  At n=33 the
    batch-on-sublanes layout of :class:`PallasNRContext` pads 2n=66 up to
    2*npad=256 lanes — 74% of every matmul row is padding; transposed, the
    operators are (2nb, 2nb) with nb=40 and each matmul is
    (2nb, 2nb) @ (2nb, tile): ~10x fewer padded FLOPs, and the whole solve
    is still ONE fused op per call (no XLA While in the rollout's way).
    """

    def __init__(self, grid):
        n = grid.n_bus
        nb = _round_up(n, 8)
        g64 = np.asarray(grid.g_mat, np.float64)
        b64 = np.asarray(grid.b_mat, np.float64)
        y_diag = np.sqrt(np.diag(g64) ** 2 + np.diag(b64) ** 2)
        inv_c = 1.0 / float(np.max(y_diag))
        gs, bs = g64 * inv_c, b64 * inv_c

        def pad(m):
            out = np.zeros((nb, nb), np.float64)
            out[:n, :n] = m
            return out

        # column-vector operator: [Ir; Ii] = ymat @ [e-1; f]
        ymat = np.block([[pad(gs), pad(-bs)], [pad(bs), pad(gs)]])
        self.ymat = ymat.astype(np.float32)

        # preconditioner: [dth; dnu] = wmat @ [fP; fQ]
        w = np.asarray(grid.j0_inv, np.float64) / inv_c
        m = n - 1
        wmat = np.zeros((2 * nb, 2 * nb), np.float64)
        for (r, c), (ro, co) in {(0, 0): (1, 1), (0, 1): (1, nb + 1),
                                 (1, 0): (nb + 1, 1), (1, 1): (nb + 1, nb + 1)}.items():
            wmat[ro:ro + m, co:co + m] = w[r * m:(r + 1) * m, c * m:(c + 1) * m]
        self.wmat = wmat.astype(np.float32)

        rs = np.zeros((2 * nb, 1), np.float64)
        rs[:n, 0] = np.asarray(grid.rowsum_g, np.float64) * inv_c
        rs[nb:nb + n, 0] = np.asarray(grid.rowsum_b, np.float64) * inv_c
        self.rowsum = rs.astype(np.float32)

        mask = np.zeros((2 * nb, 1), np.float32)
        mask[1:n, 0] = 1.0
        mask[nb + 1:nb + n, 0] = 1.0
        self.mask = mask

        self.n = n
        self.nb = nb
        self.inv_c = inv_c
        self.slack_vm = float(grid.slack_vm)
        # batch tile on lanes; ~14 live (2nb, tile) arrays + the two
        # (2nb, 2nb) operators, comfortably inside VMEM for nb <= ~200
        self.tile = 2048 if nb <= 64 else (1024 if nb <= 160 else 512)


_CTX_SMALL_CACHE = {}


def get_ctx_small(grid) -> PallasNRSmallContext:
    key = _grid_fingerprint(grid)
    if key not in _CTX_SMALL_CACHE:
        _CTX_SMALL_CACHE[key] = PallasNRSmallContext(grid)
    return _CTX_SMALL_CACHE[key]


def _nr_kernel_small(spec_ref, v0_ref, ymat_ref, wmat_ref, rs_ref, mask_ref,
                     v_out, err_out, it_out, *, tol, max_iter, inner_iters,
                     nb):
    """Transposed twin of :func:`_nr_kernel`: every state array is
    (2*nb, tile) with [real-half; imag-half] on the SUBLANE axis and batch
    lanes on the LANE axis; the operators act by left-multiplication."""
    mask = mask_ref[:]
    ymat = ymat_ref[:]
    wmat = wmat_ref[:]
    rowsum = rs_ref[:]
    spec = spec_ref[:] * mask

    def split(x):
        return x[:nb, :], x[nb:, :]

    def join(a, b):
        return jnp.concatenate([a, b], axis=0)

    s_ref = jnp.maximum(jnp.max(jnp.abs(spec), axis=0, keepdims=True), 1.0)

    def mismatch(v):
        e, f = split(v)
        cur = _dot(ymat, join(e - 1.0, f)) + rowsum    # [Ir; Ii]
        ir, ii = split(cur)
        pq = join(e * ir + f * ii, f * ir - e * ii)
        return (spec - pq) * mask, cur

    def newton_dir(fvec, v, cur):
        e, f = split(v)
        ir, ii = split(cur)
        d = _dot_fast(wmat, fvec)                      # [dth; dnu]
        for _ in range(inner_iters):
            dth, dnu = split(d)
            de = -f * dth + e * dnu
            df = e * dth + f * dnu
            dcur = _dot_fast(ymat, join(de, df))
            dir_, dii = split(dcur)
            jv = join(de * ir + e * dir_ + df * ii + f * dii,
                      df * ir + f * dir_ - de * ii - e * dii) * mask
            d = d + _dot_fast(wmat, fvec - jv)
        return split(d)

    v0 = v0_ref[:]
    fvec0, cur0 = mismatch(v0)
    err0 = jnp.max(jnp.abs(fvec0), axis=0, keepdims=True) / s_ref
    done0 = jnp.where(err0 < tol, 1.0, 0.0)

    def cond(c):
        it, alldone = c[0], c[1]
        return jnp.logical_and(it < max_iter, alldone < 0.5)

    def body(c):
        it, _, v, fvec, cur, err, done, niter = c
        e, f = split(v)
        dth, dnu = newton_dir(fvec, v, cur)
        gate = 1.0 - done
        niter2 = niter + gate
        cos_d = jnp.cos(gate * dth)
        sin_d = jnp.sin(gate * dth)
        scale = 1.0 + gate * dnu
        e2 = scale * (e * cos_d - f * sin_d)
        f2 = scale * (f * cos_d + e * sin_d)
        v2 = join(e2, f2)
        fvec2, cur2 = mismatch(v2)
        err2 = jnp.max(jnp.abs(fvec2), axis=0, keepdims=True) / s_ref
        vm2sq = jnp.max(e2 * e2 + f2 * f2, axis=0, keepdims=True)
        stop = jnp.logical_or(
            jnp.logical_or(~jnp.isfinite(err2), err2 < tol), vm2sq > 100.0)
        done2 = jnp.maximum(done, jnp.where(stop, 1.0, 0.0))
        return it + 1, jnp.min(done2), v2, fvec2, cur2, err2, done2, niter2

    out = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.min(done0), v0, fvec0, cur0,
         err0, done0, jnp.zeros_like(err0)))
    v_out[:] = out[2]
    err_out[:] = out[5]
    it_out[:] = out[7]


def nr_solve_pallas_small(grid, p_inj, q_inj, *, tol=1e-7, max_iter=20,
                          inner_iters=3, vm0=None, va0=None, interpret=False):
    """Batched NR via the transposed small-grid kernel (bus on sublanes,
    batch on lanes).  Same contract as :func:`nr_solve_pallas`."""
    ctx = get_ctx_small(grid)
    n, nb = ctx.n, ctx.nb
    batch_shape = p_inj.shape[:-1]
    bsz = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    tile = min(ctx.tile, _round_up(bsz, 128))
    bpad = _round_up(max(bsz, tile), tile)
    dtype = jnp.float32

    spec = jnp.zeros((2 * nb, bpad), dtype)
    spec = spec.at[:n, :bsz].set(
        (p_inj.reshape(bsz, n).astype(dtype) * ctx.inv_c).T)
    spec = spec.at[nb:nb + n, :bsz].set(
        (q_inj.reshape(bsz, n).astype(dtype) * ctx.inv_c).T)

    if vm0 is None:
        vm0b = jnp.full((bsz, n), 1.0, dtype).at[:, 0].set(ctx.slack_vm)
    else:
        vm0b = vm0.reshape(bsz, n).astype(dtype)
    va0b = (jnp.zeros((bsz, n), dtype) if va0 is None
            else va0.reshape(bsz, n).astype(dtype))
    v0 = jnp.zeros((2 * nb, bpad), dtype)
    v0 = v0.at[:nb, :].set(1.0)
    v0 = v0.at[:n, :bsz].set((vm0b * jnp.cos(va0b)).T)
    v0 = v0.at[nb:nb + n, :bsz].set((vm0b * jnp.sin(va0b)).T)

    kern = functools.partial(
        _nr_kernel_small, tol=tol, max_iter=max_iter,
        inner_iters=inner_iters, nb=nb)
    bspec = pl.BlockSpec((2 * nb, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((2 * nb, 2 * nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((2 * nb, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)

    mat_bytes = 2 * (2 * nb) * (2 * nb) * 4
    live_bytes = 24 * (2 * nb) * tile * 4
    vmem_limit = min(2 * (mat_bytes + live_bytes) + (16 << 20), 100 << 20)

    v, err, it = pl.pallas_call(
        kern,
        grid=(bpad // tile,),
        in_specs=[bspec, bspec, mspec, mspec, vspec, vspec],
        out_specs=[bspec, espec, espec],
        out_shape=[jax.ShapeDtypeStruct((2 * nb, bpad), dtype),
                   jax.ShapeDtypeStruct((1, bpad), dtype),
                   jax.ShapeDtypeStruct((1, bpad), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)),
        interpret=interpret,
    )(spec, v0, ctx.ymat, ctx.wmat, ctx.rowsum, ctx.mask)

    e = v[:n, :bsz].T.reshape(batch_shape + (n,))
    f = v[nb:nb + n, :bsz].T.reshape(batch_shape + (n,))
    vm = jnp.sqrt(e * e + f * f)
    va = jnp.arctan2(f, e)
    err = err[0, :bsz].reshape(batch_shape)
    converged = jnp.logical_and(err < tol, jnp.isfinite(err))
    n_iter = it[0, :bsz].reshape(batch_shape).astype(jnp.int32)

    p_bus, q_bus = bus_injections(grid, vm, va)
    pl_mw, loading = branch_results(grid, vm, va)
    return PFResult(
        vm=vm, va=va, p_bus=p_bus, q_bus=q_bus, pl_mw=pl_mw,
        loading=loading, converged=converged, n_iter=n_iter)


def make_auto_solver(grid, *, tol=1e-7, max_iter=20, backend="auto",
                     min_batch=64, fixed_iter=None, inner_iters=3):
    """A per-lane NR solve that auto-dispatches under ``vmap``.

    Returns ``solve(p, q, vm0, va0) -> PFResult`` for one lane ((n,) arrays).
    Under ``jax.vmap`` the custom batching rule routes the whole batch to the
    fused Pallas kernel when running on TPU with >= ``min_batch`` lanes, and
    to the XLA matrix-free solver otherwise — so environment code written
    per-lane gets the fused kernel for free.  This is the production solver
    the environment binds (mapdn_tpu.envs.voltage_control, EnvConfig
    pf_backend); the per-step pandapower.runpp of the reference
    (voltage_control_env.py:124,165,557) maps here.

    backend: 'auto' (TPU + grid-size heuristic, below), 'xla' (never
    kernel), 'pallas' (always kernel for batched calls, ignoring min_batch;
    runs in interpreter mode off-TPU so the dispatch path itself is testable
    on CPU).

    The 'auto' policy is MEASURED, not assumed (TPU v5e, batch 8192/4096,
    scripts/bench_solvers.py, see BENCH_SOLVERS.json; round-4 numbers with
    the packed XLA solver):
      * n_bus <= 200 -> XLA matrix-free.  The transposed small-grid kernel
        (nr_solve_pallas_small) wins the solver microbench at case33
        (15.5M vs 13.8M solves/s) but the advantage does not survive inside
        the fused train chunk (137-147 ms either way, run variance larger
        than the delta), and its default-precision Newton-direction matmuls
        raise the spurious-divergence rate from 2e-6 to 5e-5 — so the
        default stays on the XLA path; the kernel remains selectable via
        pf_backend='pallas' for n_bus <= 64.  case141 is a statistical tie
        (4.0-4.7M both).
      * n_bus > 200  -> packed batch-on-sublanes kernel (case322: +39% at
        the solver, +19% end-to-end).

    ``fixed_iter``: forwarded to :func:`nr_solve`'s unrolled fixed-iteration
    path (XLA branch only; the Pallas kernels run their loops fused
    on-chip, where the While costs nothing).
    """
    from jax.custom_batching import custom_vmap

    def _xla(p, q, vm0, va0):
        return nr_solve(grid, p, q, tol=tol, max_iter=max_iter,
                        vm0=vm0, va0=va0, fixed_iter=fixed_iter,
                        inner_iters=inner_iters)

    on_tpu = jax.default_backend() == "tpu"
    forced = backend == "pallas"
    small = grid.n_bus <= 64
    use_pallas = forced or (backend == "auto" and on_tpu
                            and grid.n_bus > 200)
    interpret = forced and not on_tpu

    @custom_vmap
    def solve(p, q, vm0, va0):
        return _xla(p, q, vm0, va0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, p, q, vm0, va0):
        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x, (axis_size,) + x.shape)

        p, q, vm0, va0 = (bc(a, b) for a, b in
                          zip((p, q, vm0, va0), in_batched))
        if use_pallas and (forced or axis_size >= min_batch):
            kernel = nr_solve_pallas_small if small else nr_solve_pallas
            res = kernel(grid, p, q, tol=tol, max_iter=max_iter,
                         inner_iters=inner_iters,
                         vm0=vm0, va0=va0, interpret=interpret)
            if res.vm.dtype != p.dtype:  # kernel computes in f32
                res = jax.tree_util.tree_map(
                    lambda x: x.astype(p.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, res)
        else:
            res = _xla(p, q, vm0, va0)
        return res, jax.tree_util.tree_map(lambda _: True, res)

    return solve
