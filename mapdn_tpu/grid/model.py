"""Immutable grid data model: the TPU-native replacement for the pandapower net.

The reference stores the grid as a mutable pandapower network object
(``pp.from_pickle`` at voltage_control_env.py:400-405 in the reference) whose
load/sgen dataframes are mutated every step.  Here the grid is a frozen pytree
of arrays built once at startup; time-varying quantities (load P/Q, PV P/Q)
live in the environment state, never in the grid.

Electrical model
----------------
Standard pi-model branches on a common system base (``sn_mva``):

    z_base(line) = vn_kv(from_bus)^2 / sn_mva
    y_series     = 1 / (r_pu + j x_pu)
    b_charge     = 2 pi f * c_nf * 1e-9 * z_base     (line charging susceptance)

Y-bus is dense (n_bus x n_bus), split into real G and imaginary B parts so the
power-flow kernel runs in pure real arithmetic (TPU-friendly; complex dtypes
lower poorly to the MXU).  Distribution feeders at MAPDN scale (33..322 buses)
fit comfortably: case322's Y-bus is 322*322*2*4B = 0.8 MB.

Transformers are modelled as branches with an off-nominal tap ratio ``tap``
on the from side (ideal-transformer + series impedance), matching the common
textbook model; the shipped synthetic cases are pure-line feeders like the
reference's case33 (Baran & Wu 1989).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Grid:
    """Static description of one distribution network (a pytree of arrays).

    All arrays are numpy/jax arrays; fields marked ``pytree_node=False`` are
    python metadata treated as static under jit.
    """

    # --- bus tables ---------------------------------------------------------
    vn_kv: jnp.ndarray          # (n_bus,) nominal voltage per bus [kV]
    bus_zone: jnp.ndarray       # (n_bus,) int zone id; 0 = main (slack) zone
    slack_bus: jnp.ndarray      # () int index of the ext-grid bus
    slack_vm: jnp.ndarray       # () slack voltage setpoint [pu]

    # --- branch tables (lines + trafos unified) -----------------------------
    f_bus: jnp.ndarray          # (n_branch,) from-bus index
    t_bus: jnp.ndarray          # (n_branch,) to-bus index
    br_r: jnp.ndarray           # (n_branch,) series resistance [pu]
    br_x: jnp.ndarray           # (n_branch,) series reactance [pu]
    br_b: jnp.ndarray           # (n_branch,) total charging susceptance [pu]
    tap: jnp.ndarray            # (n_branch,) off-nominal tap ratio (1.0 = line)
    max_i_ka: jnp.ndarray       # (n_branch,) thermal limit [kA] (for loading %)
    # 1.0 for line branches, 0.0 for transformer branches: the reference's
    # line-loss reward term reads res_line only — lines, NOT trafos
    # (reference voltage_control_env.py:599-600) — so losses on trafo
    # branches must be excluded from the reward/info line-loss sums
    is_line: jnp.ndarray        # (n_branch,)

    # --- admittance matrix (dense, precomputed) -----------------------------
    g_mat: jnp.ndarray          # (n_bus, n_bus) Re(Ybus) [pu]
    b_mat: jnp.ndarray          # (n_bus, n_bus) Im(Ybus) [pu]
    # inverse of the flat-start polar Jacobian (2(n-1), 2(n-1)), computed in
    # float64 at build time; the power-flow kernel uses it as a frozen
    # preconditioner so each NR iteration is pure matmuls (no on-device LU)
    j0_inv: jnp.ndarray
    # exact row sums of G/B (float64 at build time): Ybus rows of a feeder
    # nearly cancel (y_ij ~ 1e3 pu, sums ~ shunts), so the PF kernel computes
    # I = G (e-1) - B f + rowsum_g to avoid catastrophic f32 cancellation
    rowsum_g: jnp.ndarray       # (n_bus,)
    rowsum_b: jnp.ndarray       # (n_bus,)
    # per-branch admittance pieces for flow/loss results
    ys_g: jnp.ndarray           # (n_branch,) Re(1/(r+jx))
    ys_b: jnp.ndarray           # (n_branch,) Im(1/(r+jx))

    # --- device incidence ---------------------------------------------------
    load_bus: jnp.ndarray       # (n_load,) bus index of each load
    sgen_bus: jnp.ndarray       # (n_sgen,) bus index of each PV sgen
    sgen_zone: jnp.ndarray      # (n_sgen,) zone id of each PV sgen
    # scatter matrices (n_bus, n_dev): device power -> bus injection
    load_inc: jnp.ndarray       # (n_bus, n_load) 0/1
    sgen_inc: jnp.ndarray       # (n_bus, n_sgen) 0/1

    # --- static metadata ----------------------------------------------------
    name: str = struct.field(pytree_node=False, default="grid")
    sn_mva: float = struct.field(pytree_node=False, default=1.0)
    f_hz: float = struct.field(pytree_node=False, default=50.0)
    n_bus: int = struct.field(pytree_node=False, default=0)
    n_branch: int = struct.field(pytree_node=False, default=0)
    n_load: int = struct.field(pytree_node=False, default=0)
    n_sgen: int = struct.field(pytree_node=False, default=0)
    n_zone: int = struct.field(pytree_node=False, default=0)  # excl. main zone


def build_ybus(n_bus, f_bus, t_bus, r_pu, x_pu, b_pu, tap):
    """Dense Y-bus from pi-model branches (numpy, build-time only).

    With series admittance ys = 1/(r+jx), charging b and from-side tap t:

        Y[f,f] += (ys + j b/2) / t^2
        Y[t,t] +=  ys + j b/2
        Y[f,t] += -ys / t
        Y[t,f] += -ys / t

    Returns (G, B) float64 arrays.
    """
    ys = 1.0 / (np.asarray(r_pu, np.float64) + 1j * np.asarray(x_pu, np.float64))
    bc = 1j * np.asarray(b_pu, np.float64) / 2.0
    tap = np.asarray(tap, np.float64)

    y = np.zeros((n_bus, n_bus), dtype=np.complex128)
    yff = (ys + bc) / (tap * tap)
    ytt = ys + bc
    yft = -ys / tap
    np.add.at(y, (f_bus, f_bus), yff)
    np.add.at(y, (t_bus, t_bus), ytt)
    np.add.at(y, (f_bus, t_bus), yft)
    np.add.at(y, (t_bus, f_bus), yft)
    return y.real, y.imag


def make_grid(
    *,
    name,
    vn_kv,
    f_bus,
    t_bus,
    r_ohm,
    x_ohm,
    c_nf,
    max_i_ka,
    load_bus,
    sgen_bus,
    bus_zone,
    sgen_zone,
    slack_bus=0,
    slack_vm=1.0,
    sn_mva=1.0,
    f_hz=50.0,
    tap=None,
    is_line=None,
    shunt_bus=None,
    shunt_p_mw=None,
    shunt_q_mvar=None,
    dtype=jnp.float32,
):
    """Assemble a :class:`Grid` from physical-unit branch tables.

    Per-unit conversion follows the distribution-network convention the
    reference relies on through pandapower (vn of the from bus as the
    branch voltage base; system power base ``sn_mva``).

    ``shunt_*``: optional fixed shunt elements (pandapower ``net.shunt``
    semantics: consumption P + jQ at 1.0 pu voltage).  A shunt consuming
    S = P + jQ at |V| = 1 has admittance Y = (P - jQ)/sn_mva pu, added to
    the Y-bus diagonal — it then flows through the solver, the flat-start
    Jacobian and the rowsum-corrected currents with no other changes.
    """
    vn_kv = np.asarray(vn_kv, np.float64)
    f_bus = np.asarray(f_bus, np.int32)
    t_bus = np.asarray(t_bus, np.int32)
    n_bus = len(vn_kv)
    n_branch = len(f_bus)
    if tap is None:
        tap = np.ones(n_branch)
    if is_line is None:
        is_line = np.ones(n_branch)

    z_base = vn_kv[f_bus] ** 2 / sn_mva
    r_pu = np.asarray(r_ohm, np.float64) / z_base
    x_pu = np.asarray(x_ohm, np.float64) / z_base
    # line charging: b[S] = 2*pi*f*C ; to pu multiply by z_base
    b_pu = 2.0 * np.pi * f_hz * np.asarray(c_nf, np.float64) * 1e-9 * z_base

    g_mat, b_mat = build_ybus(n_bus, f_bus, t_bus, r_pu, x_pu, b_pu, tap)

    if shunt_bus is not None and len(shunt_bus):
        sb = np.asarray(shunt_bus, np.int32)
        sp = np.asarray(shunt_p_mw, np.float64)
        sq = np.asarray(shunt_q_mvar, np.float64)
        np.add.at(g_mat, (sb, sb), sp / sn_mva)
        np.add.at(b_mat, (sb, sb), -sq / sn_mva)

    # flat-start polar Jacobian (scaled-dVm formulation) and its inverse.
    # At Vm=1, Va=0 the blocks reduce to constants built from G/B row data:
    #   H = -B + diag(-q0),  N = G + diag(p0),  Jq = -G + diag(p0),
    #   L = -B + diag(q0)  with p0 = G.sum(1), q0 = -B.sum(1).
    p0 = g_mat.sum(axis=1)
    q0 = -b_mat.sum(axis=1)
    h0 = -b_mat - np.diag(q0)
    n0 = g_mat + np.diag(p0)
    jq0 = -g_mat + np.diag(p0)
    l0 = -b_mat + np.diag(q0)
    r_ = slice(1, None)  # bus 0 is the slack by construction
    j0 = np.block([[h0[r_, r_], n0[r_, r_]], [jq0[r_, r_], l0[r_, r_]]])
    j0_inv = np.linalg.inv(j0)

    ys = 1.0 / (r_pu + 1j * x_pu)

    load_bus = np.asarray(load_bus, np.int32)
    sgen_bus = np.asarray(sgen_bus, np.int32)
    n_load = len(load_bus)
    n_sgen = len(sgen_bus)
    load_inc = np.zeros((n_bus, n_load), np.float64)
    load_inc[load_bus, np.arange(n_load)] = 1.0
    sgen_inc = np.zeros((n_bus, n_sgen), np.float64)
    sgen_inc[sgen_bus, np.arange(n_sgen)] = 1.0

    bus_zone = np.asarray(bus_zone, np.int32)
    sgen_zone = np.asarray(sgen_zone, np.int32)
    n_zone = int(bus_zone.max())

    a = lambda x: jnp.asarray(x, dtype)
    return Grid(
        vn_kv=a(vn_kv),
        bus_zone=jnp.asarray(bus_zone),
        slack_bus=jnp.asarray(slack_bus, jnp.int32),
        slack_vm=a(slack_vm),
        f_bus=jnp.asarray(f_bus),
        t_bus=jnp.asarray(t_bus),
        br_r=a(r_pu),
        br_x=a(x_pu),
        br_b=a(b_pu),
        tap=a(tap),
        max_i_ka=a(max_i_ka),
        is_line=a(is_line),
        g_mat=a(g_mat),
        b_mat=a(b_mat),
        j0_inv=a(j0_inv),
        rowsum_g=a(g_mat.sum(axis=1)),
        rowsum_b=a(b_mat.sum(axis=1)),
        ys_g=a(ys.real),
        ys_b=a(ys.imag),
        load_bus=jnp.asarray(load_bus),
        sgen_bus=jnp.asarray(sgen_bus),
        sgen_zone=jnp.asarray(sgen_zone),
        load_inc=a(load_inc),
        sgen_inc=a(sgen_inc),
        name=name,
        sn_mva=float(sn_mva),
        f_hz=float(f_hz),
        n_bus=n_bus,
        n_branch=n_branch,
        n_load=n_load,
        n_sgen=n_sgen,
        n_zone=n_zone,
    )
